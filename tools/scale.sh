#!/bin/bash
# Reproduce SCALE.md's 10x/100x evidence: synthesize an isomorphic
# factor-x corpus from sf0.1 (re-synthesized automatically if the factor
# or base changes — params marker) and time the dedup/ANN family, or the
# given query subset, at both sizes.
# Usage: tools/scale.sh [factor] [synthdir] [q1,q2,...]
set -e
cd /root/repo
sbt -batch compile > /dev/null
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=$(sed -n 's/.*ADD_OPENS="\(.*\)"/\1/p' tools/verify.sh | head -1)
F="${1:-10}"
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  java $ADD_OPENS -Xmx24g -XX:ReservedCodeCacheSize=1g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.ScaleProbe "$F" "${2:-/tmp/graft-scale-x$F}" ${3:+"$3"}
