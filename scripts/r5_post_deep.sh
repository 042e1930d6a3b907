#!/bin/bash
# Round-5 milestone evaluation: run the multi-utterance copy-synthesis
# AND text->speech evals on the deep run's milestone checkpoints, save
# JSON + audio artifacts into the repo, and COMMIT in the same session
# (the r4 lesson: evidence queued for later is evidence lost).
set -u
cd /root/repo
mkdir -p artifacts/r5

run_eval() {  # run_eval <tag> <ckpt-path>
  local tag=$1 ckpt=$2
  echo "=== eval $tag ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/eval_checkpoint.py \
      -c logs/ljs_deep_r5/config.json -k "$ckpt" -n 16 --bands --tts \
      --save-audio "artifacts/r5/audio_$tag" \
      --out "artifacts/r5/eval_$tag.json" 2>&1 | tail -4
  echo "=== eval $tag exit=$? ==="
}

run_eval 25k logs/ljs_deep_r5/ckpt/25000
run_eval 50k logs/ljs_deep_r5/ckpt/50000

# best-by-eval checkpoint, if it landed on a non-milestone step
best=$(python - <<'PY'
import json, os
p = "logs/ljs_deep_r5/ckpt/best.json"
if os.path.exists(p):
    rec = json.load(open(p))
    if rec["step"] not in (25000, 50000):
        print(rec["step"])
PY
)
if [ -n "$best" ]; then
  run_eval "best_$best" "logs/ljs_deep_r5/ckpt/$best"
fi
cp logs/ljs_deep_r5/ckpt/best.json artifacts/r5/best.json 2>/dev/null

git add artifacts/r5
git commit -m "Deep-run milestone evaluations: n=16 copy-synthesis + TTS-path, audio artifacts" \
  && echo COMMITTED
echo "POST-DEEP DONE $(date +%H:%M:%S)"
