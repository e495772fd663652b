#!/bin/bash
# Round-5 e2e certification chain (single TPU, sequential). Run AFTER the
# round's kernel changes are frozen (curv_term restructure, o2a payload,
# dense coverage) — every stage recertifies against them:
#  1. dense-cloud bench (kernels now cover n=5000/10000)
#  2. flagship PointNet e2e (train + distill + full-budget attack at the
#     CLI default K=10/packed-nn1 + defense + smoothness) — the round-5
#     kernel recert
#  3. SSG e2e   4. MSG e2e
#  5. All-mode CE + integrated Margin retry (the paper's protocol)
#  6. escalation ladder incl. the round-5 heavy rungs + 2nd-victim diag
# Logs to /tmp/r5chain_<stage>.log; the chain stops on failure.
set -x
cd /root/repo || exit 9
python runs/bench_dense.py > /tmp/r5chain_dense.log 2>&1 || exit 1
python runs/flagship_run.py > /tmp/r5chain_flagship.log 2>&1 || exit 2
python runs/pnpp_run.py > /tmp/r5chain_pnpp.log 2>&1 || exit 3
python runs/msg_run.py > /tmp/r5chain_msg.log 2>&1 || exit 4
python runs/all_mode_margin_run.py > /tmp/r5chain_allmode.log 2>&1 || exit 5
python runs/all_mode_escalate.py > /tmp/r5chain_escalate.log 2>&1 || exit 6
echo R5_CHAIN_DONE
