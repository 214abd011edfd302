#!/bin/bash
# Round-4 decode bench sweep (VERDICT r3 item 1): measure the round-3 decode
# bandwidth stack on the real TPU.  Serialized (ONE TPU process at a time);
# each run gets a 30-min budget (remote compile is slow; killing mid-compile
# can wedge the tunnel, so budgets are generous rather than tight).
# Appends one JSON line per config to artifacts/decode_sweep_r4.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/decode_sweep_r4.jsonl
mkdir -p artifacts

run() {  # run <tag> <env...>
  local tag=$1; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
  local line rc
  # pipefail inside the substitution: without it $? is tail's status
  # (always 0) and a timed-out/crashed bench records rc=0 in the artifact
  line=$(set -o pipefail;
         env "$@" timeout 1800 python bench.py 2>/tmp/sweep_err.log | tail -1)
  rc=$?
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", \"rc\": $rc, \"result\": $line}" >> "$OUT"
  else
    echo "{\"tag\": \"$tag\", \"rc\": $rc, \"result\": null}" >> "$OUT"
    tail -5 /tmp/sweep_err.log >&2
  fi
  sleep 5
}

# TF-XL decode, base/1024
run tfxl_b256_int8  BENCH_MODE=decode BENCH_BSZ=256 BENCH_KV=int8
run tfxl_b256_bf16  BENCH_MODE=decode BENCH_BSZ=256 BENCH_KV=bf16
run tfxl_b512_int8  BENCH_MODE=decode BENCH_BSZ=512 BENCH_KV=int8
run tfxl_b512_bf16  BENCH_MODE=decode BENCH_BSZ=512 BENCH_KV=bf16

# Reformer decode, base/2048; scan_chunk 512 = live-prefix streaming (auto
# default), 2048 = single full-cache chunk (the pre-round-3 behavior)
run ref_b128_int8_c512   BENCH_MODE=decode BENCH_MODEL=reformer BENCH_BSZ=128 BENCH_KV=int8 BENCH_SCAN_CHUNK=512
run ref_b128_bf16_c512   BENCH_MODE=decode BENCH_MODEL=reformer BENCH_BSZ=128 BENCH_KV=bf16 BENCH_SCAN_CHUNK=512
run ref_b128_int8_c2048  BENCH_MODE=decode BENCH_MODEL=reformer BENCH_BSZ=128 BENCH_KV=int8 BENCH_SCAN_CHUNK=2048
run ref_b128_bf16_c2048  BENCH_MODE=decode BENCH_MODEL=reformer BENCH_BSZ=128 BENCH_KV=bf16 BENCH_SCAN_CHUNK=2048
run ref_b256_int8_c512   BENCH_MODE=decode BENCH_MODEL=reformer BENCH_BSZ=256 BENCH_KV=int8 BENCH_SCAN_CHUNK=512
run ref_b256_bf16_c512   BENCH_MODE=decode BENCH_MODEL=reformer BENCH_BSZ=256 BENCH_KV=bf16 BENCH_SCAN_CHUNK=512
run ref_b256_int8_c2048  BENCH_MODE=decode BENCH_MODEL=reformer BENCH_BSZ=256 BENCH_KV=int8 BENCH_SCAN_CHUNK=2048
run ref_b256_bf16_c2048  BENCH_MODE=decode BENCH_MODEL=reformer BENCH_BSZ=256 BENCH_KV=bf16 BENCH_SCAN_CHUNK=2048

echo "sweep done $(date)" >> "$OUT"
