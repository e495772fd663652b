#!/bin/bash
# Round-5b final certification chain (after the tfac curv_term commit).
# Sequential on the single TPU; each stage logs under runs/artifacts/.
# ORDERING CONTRACT (same as round5_protocol.sh): bench.py runs LAST,
# twice, with no env overrides — the driver's exact command — so the
# driver's measurement hits the warm persistent cache.
set -x
cd /root/repo || exit 9

# 1-3. e2e recerts with the final kernels (tfac landed after the 08:04
#      recerts; CD/HD must be re-anchored per victim)
python runs/flagship_run.py > runs/artifacts/r5b_flagship_log.txt 2>&1 || exit 1
python runs/pnpp_run.py     > runs/artifacts/r5b_pnpp_log.txt 2>&1     || exit 2
python runs/msg_run.py      > runs/artifacts/r5b_msg_log.txt 2>&1      || exit 3

# 4. FULL TPU kernel selfcheck -> artifact must carry every expected check
python runs/tpu_selfcheck.py > /tmp/r5b_selfcheck.log 2>&1 || exit 4

# 5. driver dryrun (multichip sharding compiles + executes)
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" \
  > /tmp/r5b_dryrun.log 2>&1 || exit 5

# 6. LAST: the driver's exact command, TWICE (first may compile cold —
#    that IS the warm-up; second must hit the persistent cache)
python bench.py > /tmp/r5b_bench_warm.json 2> /tmp/r5b_bench_warm.log || exit 6
python bench.py > /tmp/r5b_bench.json 2> /tmp/r5b_bench.log || exit 6
python - <<'EOF' || exit 7
import json
out = json.load(open("/tmp/r5b_bench.json"))
assert out["value"] > 0, out
print("bench cached-run check:", out)
if out.get("compile_s", 0) >= 300:
    raise SystemExit("bench compile was COLD (%.0fs) on the SECOND run" %
                     out["compile_s"])
EOF
echo R5B_CHAIN_DONE
