#!/bin/bash
# Round-13 end-of-round measurement block: run SEQUENTIALLY on a quiet box
# (never overlap with sbt/package — a jar replaced under a running JVM
# kills it with "zip END header not found"; re-confirmed this round).
set -o pipefail
cd "$(dirname "$0")/.."
echo "== [1/7] full correctness gate (sf0.01) =="
SPARK_GRAFT_CPUS=8 tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/vfull \
  2>/tmp/m_verify_err.txt | tail -2
python3 tools/check.py /root/testdata/sf0.01 /tmp/vfull 2>&1 | tail -3
echo "== [2/7] demos =="
tools/run.sh graft.app.PipelineDemo 5000 2>/dev/null | tail -3; echo "PipelineDemo EXIT=$?"
tools/run.sh graft.app.StreamDemo 2000 3 2>/dev/null | tail -2; echo "StreamDemo EXIT=$?"
tools/run.sh graft.app.WarehouseDemo 2>/dev/null | tail -3; echo "WarehouseDemo EXIT=$?"
tools/run.sh graft.app.ExplainAudit 2>/dev/null | tail -3; echo "ExplainAudit EXIT=$?"
echo "== [3/7] bench sf0.1 session A =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=tools/bench_latest.json \
  tools/run.sh graft.Bench 2>/tmp/m_bench_err.txt | tail -1
echo "== [4/7] bench sf0.1 session B (code-cache A/B, VERDICT r12 task 2) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sessionB.json \
  tools/run.sh graft.Bench 2>/tmp/m_bench_errB.txt | tail -1
echo "== [5/7] scale curve =="
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  tools/run.sh graft.app.ScaleCurve 2>/tmp/m_curve_err.txt | tee /tmp/scale_curve_new.txt
echo "CURVE_EXIT=$?"
echo "== [6/7] corpus funnel =="
tools/run.sh graft.app.CorpusPipeline /root/testdata/sf0.01 2>/dev/null | tail -4
echo "CorpusPipeline EXIT=$?"
echo "== [7/7] done =="
