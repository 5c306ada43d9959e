#!/bin/bash
# TPU measurement sweep (originally the r6 backlog; ALL steps were measured
# in r7 — results recorded in docs/BENCHMARKS.md "round 6" table — so this
# now serves as the rerun harness for fresh hardware/sessions). Serialized —
# the box has ONE host core and concurrent TPU runs contend. Each step logs
# to /tmp/wktpu_measurements/<name>.log; a step failing does not stop the rest.
#
# Run: bash tools/run_pending_measurements.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/wktpu_measurements}"
mkdir -p "$OUT"

echo "== tunnel probe =="
if ! timeout 90 python -c "import jax; print(jax.devices())"; then
    echo "TPU backend unreachable — aborting (re-run when the tunnel is back)"
    exit 1
fi

run() { # name timeout_s command...
    local name="$1" t="$2"; shift 2
    echo "== $name (timeout ${t}s) =="
    timeout "$t" "$@" 2>&1 | tee "$OUT/$name.log" | tail -5
}

# 1. int8 self-KV in-loop step cost vs the serving base (r6 candidate)
run selfkv_step 2400 python tools/perf_decode.py --serving --variant large-v3 \
    --batch 32 --only base,int8_self_kv

# 2. Pallas decode-kernel A/Bs (separate processes: trace-time env gates)
run pallas_cross_step 2400 python tools/perf_decode.py --serving \
    --variant large-v3 --batch 32 --pallas-cross --only base
run pallas_self_step 2400 python tools/perf_decode.py --serving \
    --variant large-v3 --batch 32 --pallas-self --only base
run pallas_both_step 2400 python tools/perf_decode.py --serving \
    --variant large-v3 --batch 32 --pallas-cross --pallas-self --only base
run pallas_self_int8_step 2400 python tools/perf_decode.py --serving \
    --variant large-v3 --batch 32 --pallas-self --only int8_self_kv

# 3. int8 self-KV at pipeline level (serving preset + self-KV)
run selfkv_pipeline 3600 python tools/probe_pipeline_config.py --self-kv

# 4. W4A16 pipeline (serving int8 cross-KV + 4-bit weights, b=32)
run w4a16_pipeline 3600 python tools/probe_pipeline_config.py --quant w4a16

# 5. W4A16 b=1 latency step (the weight-bound case 4-bit targets)
run w4a16_b1_step 2400 python tools/perf_decode.py --quant w4a16 \
    --variant large-v3 --batch 1 --only base

# 6. W8A16 b=1 baseline for the same comparison
run w8a16_b1_step 2400 python tools/perf_decode.py --quant w8a16 \
    --variant large-v3 --batch 1 --only base

# 7. TTS W4A16 (code predictor is pure weight bandwidth)
run tts_w4a16 2400 python tools/perf_tts.py --quantize w4a16
run tts_w8a16 2400 python tools/perf_tts.py --quantize w8a16

# 8. full bench (also warms the XLA compile cache for the round-end run)
run bench 7200 python bench.py

echo "== done; logs in $OUT =="
