#!/bin/bash
# Round-3 protocol chain (single TPU, sequential):
#  1. SSG e2e certification (train exists; distill + full-budget attack)
#  2. MSG e2e certification
#  3. Targeted All-mode: CE pass + integrated Margin retry (id 6, resumable)
#  4. Escalation ladder over the remaining failures
# Each stage logs to /tmp/proto_<stage>.log; the chain stops on failure.
set -x
cd /root/repo
python runs/pnpp_run.py > /tmp/proto_pnpp.log 2>&1 || exit 1
python runs/msg_run.py > /tmp/proto_msg.log 2>&1 || exit 2
python runs/all_mode_margin_run.py > /tmp/proto_allmode.log 2>&1 || exit 3
python runs/all_mode_escalate.py > /tmp/proto_escalate.log 2>&1 || exit 4
echo PROTOCOL_CHAIN_DONE
