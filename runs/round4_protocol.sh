#!/bin/bash
# Round-4 re-certification chain (single TPU, sequential), run AFTER the
# round-4 generator/selection fixes (de-degenerated synthetic shapes +
# kernel-path-independent checkpoint/distillation selection):
#  0. flagship PointNet e2e was already re-run (runs/flagship_r4_log.txt:
#     100% test acc victim, 250/250 distilled, 250/250 = 100% attack)
#  1. SSG e2e certification (fresh train + distill + full-budget attack)
#  2. MSG e2e certification — the round-3 90% regression target: must be
#     250/250 now that no class is a perfect primitive
#  3. Targeted All-mode: CE pass + integrated Margin retry (id 6, resumable)
#  4. Escalation ladder over any remaining failures
# Each stage logs to /tmp/proto4_<stage>.log; the chain stops on failure.
set -x
cd /root/repo
python runs/pnpp_run.py > /tmp/proto4_pnpp.log 2>&1 || exit 1
python runs/msg_run.py > /tmp/proto4_msg.log 2>&1 || exit 2
python runs/all_mode_margin_run.py > /tmp/proto4_allmode.log 2>&1 || exit 3
python runs/all_mode_escalate.py > /tmp/proto4_escalate.log 2>&1 || exit 4
echo PROTOCOL_CHAIN_DONE
