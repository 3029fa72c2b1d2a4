#!/bin/bash
# Reproduce SCALE.md's 10x evidence: synthesize an isomorphic 10x corpus
# from sf0.1 (first run only) and time the dedup/ANN family at both sizes.
# Usage: tools/scale.sh [factor] [synthdir]
set -e
cd /root/repo
sbt -batch compile > /dev/null
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=$(sed -n 's/.*ADD_OPENS="\(.*\)"/\1/p' tools/verify.sh | head -1)
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  java $ADD_OPENS -Xmx24g -XX:ReservedCodeCacheSize=1g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.ScaleProbe "${1:-10}" "${2:-/tmp/graft-scale-x10}"
