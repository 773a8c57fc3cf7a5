#!/bin/bash
# Plain-JVM runner for graft measurement mains (no sbt startup, no sbt
# log decoration): tools/run_jvm.sh <MainClass> [args...]
# Env: SPARK_GRAFT_REPS, SPARK_GRAFT_CPUS, JVM_XMX (default 24g).
set -euo pipefail
cd "$(dirname "$0")/.."
XMX="${JVM_XMX:-24g}"
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$XMX" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
