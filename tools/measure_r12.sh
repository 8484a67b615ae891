#!/bin/bash
# Round-12 end-of-round measurement block: run SEQUENTIALLY on a quiet box
# (a concurrent sbt/package run this round corrupted a ScaleCurve cell by
# replacing the jar under the running JVM — never overlap these).
set -o pipefail
cd "$(dirname "$0")/.."
echo "== [1/6] full correctness gate (sf0.01) =="
SPARK_GRAFT_CPUS=8 tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/vfull \
  2>/tmp/m_verify_err.txt | tail -2
python3 tools/check.py /root/testdata/sf0.01 /tmp/vfull 2>&1 | tail -3
echo "== [2/6] demos =="
tools/run.sh graft.app.PipelineDemo 5000 2>/dev/null | tail -3; echo "PipelineDemo EXIT=$?"
tools/run.sh graft.app.StreamDemo 2000 3 2>/dev/null | tail -2; echo "StreamDemo EXIT=$?"
tools/run.sh graft.app.WarehouseDemo 2>/dev/null | tail -3; echo "WarehouseDemo EXIT=$?"
tools/run.sh graft.app.ExplainAudit 2>/dev/null | tail -3; echo "ExplainAudit EXIT=$?"
echo "== [3/6] bench sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  tools/run.sh graft.Bench 2>/tmp/m_bench_err.txt | tail -1
echo "== [4/6] scale curve =="
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  tools/run.sh graft.app.ScaleCurve 2>/tmp/m_curve_err.txt | tee /tmp/scale_curve_new.txt
echo "CURVE_EXIT=$?"
echo "== [5/6] corpus funnel =="
tools/run.sh graft.app.CorpusPipeline /root/testdata/sf0.01 2>/dev/null | tail -4
echo "CorpusPipeline EXIT=$?"
echo "== [6/6] done =="
