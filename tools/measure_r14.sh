#!/bin/bash
# Round-14 end-of-round measurement block: run SEQUENTIALLY on a quiet box
# (never overlap with sbt/package — a jar replaced under a running JVM
# kills it with "zip END header not found").
set -o pipefail
cd "$(dirname "$0")/.."
echo "== [1/8] full correctness gate (sf0.01) =="
SPARK_GRAFT_CPUS=8 tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/vfull \
  2>/tmp/m_verify_err.txt | tail -2
python3 tools/check.py /root/testdata/sf0.01 /tmp/vfull 2>&1 | tail -3
echo "== [2/8] demos =="
tools/run.sh graft.app.PipelineDemo 5000 2>/dev/null | tail -3; echo "PipelineDemo EXIT=$?"
tools/run.sh graft.app.StreamDemo 2000 3 2>/dev/null | tail -2; echo "StreamDemo EXIT=$?"
tools/run.sh graft.app.WarehouseDemo 2>/dev/null | tail -3; echo "WarehouseDemo EXIT=$?"
tools/run.sh graft.app.ExplainAudit 2>/dev/null | tail -3; echo "ExplainAudit EXIT=$?"
echo "== [3/8] bench sf0.1 session A =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=tools/bench_latest.json \
  tools/run.sh graft.Bench 2>/tmp/m_bench_err.txt | tail -1
echo "== [4/8] bench sf0.1 session B (same-binary spread check) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sessionB.json \
  tools/run.sh graft.Bench 2>/tmp/m_bench_errB.txt | tail -1
echo "== [5/8] scale curve (incl. new q245/q246 cells) =="
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  tools/run.sh graft.app.ScaleCurve 2>/tmp/m_curve_err.txt | tee /tmp/scale_curve_new.txt
echo "CURVE_EXIT=$?"
echo "== [6/8] DuckDB side-by-side for the round-14 oracle cells =="
SPARK_GRAFT_CPUS=8 tools/run.sh graft.Verify /root/testdata/sf0.1 /tmp/v01 \
  q211_jonckheere q245_ccnet_buckets q246_source_overlap \
  q247_incremental_source_overlap 2>/dev/null | tail -1
python3 tools/bench_oracle.py /root/testdata/sf0.1 /tmp/v01 tools/bench_latest.json \
  2>&1 | tail -10
echo "== [7/8] corpus funnel =="
tools/run.sh graft.app.CorpusPipeline /root/testdata/sf0.01 2>/dev/null | tail -4
echo "CorpusPipeline EXIT=$?"
echo "== [8/8] done =="
