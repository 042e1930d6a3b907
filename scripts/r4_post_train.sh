#!/bin/bash
# Round-4 post-training chip session: runs the bench/drive queue
# back-to-back once the deep run has released the chip. Each step is
# timeout-bounded so a wedged tunnel can't stall the whole queue; all
# output lands in /tmp/r4/*.log.
set -u
cd /root/repo
mkdir -p /tmp/r4

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a /tmp/r4/queue.log
  timeout "$to" "$@" > "/tmp/r4/$name.log" 2>&1
  echo "=== $name exit=$? ($(date +%H:%M:%S)) ===" | tee -a /tmp/r4/queue.log
}

# 1. headline bench + e2e split (VERDICT #5) — ~5 min warm cache
run bench 1200 python bench.py

# 2. RTF-vs-length sweep (VERDICT #8) — fresh buckets pay compiles
run bench_sweep 3600 env MBIV_BENCH_SWEEP=1 python bench.py

# 3. exported-artifact serving vs live (VERDICT #9)
run bench_export 2400 python scripts/bench_export.py

# 4. MFU: flagship b32 bf16 + cost-analysis MFU (VERDICT #2 baseline)
run mfu_base 2400 python scripts/bench_train.py --batch 32 --steps 30 \
    --bf16 --device-spec --flops
# 5. MFU control: widened channels x2 / x4 (VERDICT #2)
run mfu_w2 3000 python scripts/bench_train.py --batch 32 --steps 30 \
    --bf16 --device-spec --flops --widen 2
run mfu_w4 3600 python scripts/bench_train.py --batch 32 --steps 30 \
    --bf16 --device-spec --flops --widen 4

# 6. host-fed vs double-buffered vs device-resident context (VERDICT r2 #7)
run feed_host 2400 python scripts/bench_train.py --batch 32 --steps 30 \
    --bf16 --device-spec --feed-host

# 6b. milestone quality: 16-utterance copy-synthesis at 25k/100k/200k
#     (shared .jax_cache/cli makes the bucket compiles one-time)
run eval_25k 2400 python scripts/eval_checkpoint.py \
    -c .corpus/ljs/config.json -k logs/ljs_deep_r4/ckpt/25000 -n 16 \
    --bands --out /tmp/r4/eval_25k.json
run eval_100k 1200 python scripts/eval_checkpoint.py \
    -c .corpus/ljs/config.json -k logs/ljs_deep_r4/ckpt/100000 -n 16 \
    --bands --out /tmp/r4/eval_100k.json
run eval_final 1200 python scripts/eval_checkpoint.py \
    -c .corpus/ljs/config.json -k logs/ljs_deep_r4 -n 16 \
    --bands --out /tmp/r4/eval_final.json

# 7. SDP chip drive: continue logs/ljs_sdp_r3 300 -> 1300 steps with
#    device-resident feeding (VERDICT #3); AOT avals differ from the
#    host-fed r3 cache, so this pays its own compiles once
run sdp_drive 5400 python train.py -c logs/ljs_sdp_r3/config.json \
    -m ljs_sdp_r3 --max-steps 1300 --aot-cache .aot/ljs_sdp \
    --device-resident

echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a /tmp/r4/queue.log
