#!/usr/bin/env bash
# Build the Catalyst-extension JAR (linqonsteroids_spark/ext/linq-ext.jar)
# from LinqExtensions.scala using the Scala compiler that SHIPS INSIDE
# pyspark's jars directory — no network, no sbt resolution, nothing
# beyond the baked-in environment.
set -euo pipefail
cd "$(dirname "$0")/.."

JARS=$(python3 -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
CP=$(printf '%s:' "$JARS"/*.jar)
OUT=linqonsteroids_spark/ext/build
SRC=linqonsteroids_spark/ext/src/LinqExtensions.scala
JAR=linqonsteroids_spark/ext/linq-ext.jar

rm -rf "$OUT" && mkdir -p "$OUT"
java -cp "$JARS/scala-compiler-2.13.17.jar:$JARS/scala-library-2.13.17.jar:$JARS/scala-reflect-2.13.17.jar" \
  scala.tools.nsc.Main -classpath "${CP%:}" -d "$OUT" "$SRC"
"${JAVA_HOME:-/usr/lib/jvm/java-17-openjdk-amd64}/bin/jar" cf "$JAR" -C "$OUT" .
echo "built $JAR"
