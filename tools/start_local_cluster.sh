#!/bin/bash
# Stand up a single-box Spark standalone cluster for the executor-mode
# scaling protocol (tools/scaling_bench.py with PGD_SCALING_MASTER):
# one master + 4 workers x 2 cores x 7g, shuffle dirs on /dev/shm.
#
#   bash tools/start_local_cluster.sh        # start (idempotent)
#   bash tools/start_local_cluster.sh stop   # tear down
#
# The N->4N pair is then spark.cores.max=2 (1 executor) vs 8 (4
# executor PROCESSES), the faithful analog of the north rule's "N and
# 4N executors".  get_spark pins executor -Xms and (with
# PGD_SPARK_PRETOUCH=1) AlwaysPreTouch — without it the same window
# sort measured 8x executor CPU from lazy heap-fault storms.
set -e
LOGS=/tmp/sparkcl
MASTER_URL=spark://127.0.0.1:7077

if [ "$1" = "stop" ]; then
  pkill -f org.apache.spark.deploy.worker.Worker || true
  pkill -f org.apache.spark.deploy.master.Master || true
  echo "cluster stopped"
  exit 0
fi

mkdir -p "$LOGS" /dev/shm/sparkcl-local
if ! pgrep -f org.apache.spark.deploy.master.Master >/dev/null; then
  nohup /opt/spark/bin/spark-class org.apache.spark.deploy.master.Master \
    --host 127.0.0.1 --port 7077 --webui-port 8080 > "$LOGS/master.log" 2>&1 &
  sleep 5
fi
RUNNING=$(pgrep -cf org.apache.spark.deploy.worker.Worker || true)
if [ "${RUNNING:-0}" -lt 4 ]; then
  for i in 1 2 3 4; do
    SPARK_LOCAL_DIRS=/dev/shm/sparkcl-local SPARK_WORKER_DIR="$LOGS/work$i" \
    nohup /opt/spark/bin/spark-class org.apache.spark.deploy.worker.Worker \
      "$MASTER_URL" --cores 2 --memory 7g --webui-port $((8081+i)) \
      > "$LOGS/worker$i.log" 2>&1 &
  done
  sleep 10
fi
curl -s http://127.0.0.1:8080/json/ | python -c "
import json, sys
d = json.load(sys.stdin)
alive = [w for w in d['workers'] if w['state'] == 'ALIVE']
print(f'master at $MASTER_URL, {len(alive)} ALIVE workers x', alive[0]['cores'] if alive else 0, 'cores')"
