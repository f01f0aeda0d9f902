#!/bin/bash
# Run a graft main against the packaged jar + the Spark 4 jars dir,
# with the JDK17 --add-opens set from build.sbt. Used for the bench /
# ladder artifacts so measurements never pay sbt overhead:
#
#   scripts/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/out
#   scripts/run_main.sh graft.BenchLadder x100:ann_index_build
#   scripts/run_main.sh graft.BenchLake 1 10 100
#   scripts/run_main.sh graft.FullDir 10
#
# Env: SPARK_DRIVER_MEM (default 48g), SPARK_GRAFT_CPUS, SPARK_GRAFT_SF_DIR.
set -euo pipefail
cd "$(dirname "$0")/.."
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $ADDOPENS -Xmx${SPARK_DRIVER_MEM:-48g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/kmeans_in_mapreducespark_2.13-0.1.0.jar:/opt/spark/jars/*" \
  "$@"
