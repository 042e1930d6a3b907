#!/bin/bash
# Round-5 deep-run evidence watcher. Runs alongside train.py and commits
# evidence AS PRODUCED (the r4/r5a lesson: machines get recycled, queued
# artifacts die). Every poll:
#   1. extract new in-run eval rows from train.log into
#      artifacts/r5/trajectory_r5b.log and commit when changed;
#   2. at each milestone step, snapshot the finalized checkpoint (orbax
#      finalizes via atomic tmp-dir rename, so any ckpt/<digits> dir is
#      complete), run the n=16 copy-synthesis + TTS-path eval on host
#      CPU cores (the chip keeps training), and commit the JSON + audio.
set -u
cd /root/repo
RUN=logs/ljs_deep_r5
ART=artifacts/r5
mkdir -p "$ART"
MILESTONES="10000 25000 50000"

snapshot_eval() {  # snapshot_eval <step>
  local step=$1 tag="r5b_$1" snap="/tmp/snap_$1"
  [ -f "$ART/eval_r5b_$1.json" ] && return 0
  [ -d "$RUN/ckpt/$step" ] || return 1
  rm -rf "$snap"; mkdir -p "$snap/ckpt"
  cp -r "$RUN/ckpt/$step" "$snap/ckpt/$step" || return 1
  echo "watch: eval milestone $step ($(date +%H:%M:%S))"
  JAX_PLATFORMS=cpu nice -n 10 timeout 2400 python scripts/eval_checkpoint.py \
      -c "$RUN/config.json" -k "$snap/ckpt/$step" -n 16 --bands --tts \
      --save-audio "$ART/audio_$tag" \
      --out "$ART/eval_r5b_$1.json" >> /tmp/watch_eval.log 2>&1
  local rc=$?
  rm -rf "$snap"
  if [ $rc -eq 0 ]; then
    git add "$ART/eval_r5b_$1.json" "$ART/audio_$tag" 2>/dev/null
    git commit -q -m "Deep-run r5b milestone $step: n=16 copy-synthesis + TTS-path eval (inline)" \
      && echo "watch: committed milestone $step"
  else
    echo "watch: eval $step FAILED rc=$rc (see /tmp/watch_eval.log)"
  fi
}

while true; do
  # 1. trajectory rows (step numbers come from the preceding ckpt-save line)
  if [ -f "$RUN/train.log" ]; then
    grep -E "eval: mcd|saved checkpoint at|best checkpoint" "$RUN/train.log" \
      > "$ART/trajectory_r5b.log.new" 2>/dev/null
    if ! cmp -s "$ART/trajectory_r5b.log.new" "$ART/trajectory_r5b.log" 2>/dev/null; then
      mv "$ART/trajectory_r5b.log.new" "$ART/trajectory_r5b.log"
      cp "$RUN/ckpt/best.json" "$ART/best_r5b.json" 2>/dev/null
      git add "$ART/trajectory_r5b.log" "$ART/best_r5b.json" 2>/dev/null
      git commit -q -m "Deep-run r5b trajectory update (auto-committed inline)" \
        && echo "watch: trajectory committed $(date +%H:%M:%S)"
    else
      rm -f "$ART/trajectory_r5b.log.new"
    fi
  fi
  # 2. milestone evals (one at a time; each takes ~9 min on CPU)
  for s in $MILESTONES; do
    snapshot_eval "$s"
  done
  sleep 120
done
