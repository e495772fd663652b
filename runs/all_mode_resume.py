"""Targeted All-mode attack with process-level resume.

The in-process retry in cli/main_attack.py cannot recover from a truly hung
tunnelled-TPU worker (the timed-out thread still holds the client), so this
wrapper runs the attack CLI as a subprocess and restarts it from the last
completed batch (read back from <saved_dir>/batches_done.txt) whenever the
process dies or stalls. Kills by PID only (never by pattern).
"""
import os
import subprocess
import sys
import time

REPO = "/root/repo"
CWD = os.path.join(REPO, "runs", "flagship")
SAVED_DIR = os.path.join(
    CWD,
    "Exps/PointNet_npoint1024/All/GeoA3_2_BiStep10_IterStep500_Optadam_"
    "Lr0.01_Initcons10_CE_CDLoss1.0_HDLoss0.1_CurLoss1.0_k16",
)
PROGRESS = os.path.join(SAVED_DIR, "batches_done.txt")
TOTAL_BATCHES = 42
PROC_TIMEOUT = 3600  # hard cap per subprocess launch
STALL_TIMEOUT = 900  # no batch progress for this long -> restart


def batches_done() -> int:
    try:
        with open(PROGRESS) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return 0


def progress_mtime() -> float:
    try:
        return os.path.getmtime(PROGRESS)
    except OSError:
        return 0.0


def main() -> None:
    t0 = time.time()
    for launch in range(20):
        done = batches_done()
        if done >= TOTAL_BATCHES:
            break
        cmd = [
            sys.executable, "-m", "geoa3_tpu.cli.main_attack",
            "--attack", "GeoA3", "--attack_label", "All",
            "--data_dir_file", "Data/modelnet10_250instances1024_PointNet.mat",
            "--npoint", "1024",
            "--binary_max_steps", "10", "--iter_max_steps", "500",
            "-b", "6",
            "--checkpoint", "Pretrained/PointNet/1024",
            "--batch_timeout", "600",
            "--id", "2",
            "--start_batch", str(done),
        ]
        print(f"[resume] launch {launch}: from batch {done}/{TOTAL_BATCHES}",
              flush=True)
        env = dict(
            os.environ,
            # prepend the repo but KEEP the existing entries (/root/.axon_site
            # carries the sitecustomize that registers the axon TPU backend)
            PYTHONPATH=os.pathsep.join(
                [REPO] + os.environ.get("PYTHONPATH", "").split(os.pathsep)
            ),
            JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
        )
        p = subprocess.Popen(cmd, cwd=CWD, env=env)
        start = time.time()
        last_progress = (done, progress_mtime(), time.time())
        while p.poll() is None:
            time.sleep(20)
            now = (batches_done(), progress_mtime())
            # value OR mtime moving counts as progress (the margin-retry
            # pass rewrites the file without changing the count)
            if now != last_progress[:2]:
                last_progress = (*now, time.time())
            stalled = time.time() - last_progress[2] > STALL_TIMEOUT
            if stalled or time.time() - start > PROC_TIMEOUT:
                print(f"[resume] {'stall' if stalled else 'timeout'} at batch "
                      f"{now[0]}; killing pid {p.pid}", flush=True)
                p.kill()
                p.wait()
                time.sleep(60)  # let the tunnel recover
                break
        else:
            if p.returncode == 0 and batches_done() >= TOTAL_BATCHES:
                break
            print(f"[resume] process exited rc={p.returncode} at batch "
                  f"{batches_done()}; relaunching", flush=True)
            time.sleep(30)
    print(f"[resume] finished: {batches_done()}/{TOTAL_BATCHES} batches in "
          f"{time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
