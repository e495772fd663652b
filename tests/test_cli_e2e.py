"""End-to-end pipeline test: train a tiny victim on synthetic shapes ->
distill an attack set -> run the GeoA3 attack CLI -> defense-evaluate the
outputs -> compute smoothness. Mirrors the reference workflow
(README.md usage) at miniature scale on CPU.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    cwd = os.getcwd()
    os.chdir(d)
    yield str(d)
    os.chdir(cwd)


@pytest.fixture(scope="module")
def trained_victim(workdir):
    """Train PointNet on 4 synthetic classes for a few epochs."""
    from geoa3_tpu.cli.main_train import build_parser, main

    args = build_parser().parse_args(
        [
            "--datadir", "synthetic:20:4",
            "--npoint", "64",
            "--epochs", "4",
            "-b", "16",
            "--arch", "PointNet",
            "-c", "40",  # 40-way head, only 4 classes populated
        ]
    )
    result = main(args)
    modeldir = os.path.join("Pretrained", "PointNet", "64")
    assert os.path.isfile(os.path.join(modeldir, "model_best.msgpack"))
    return modeldir, result


@pytest.fixture(scope="module")
def distilled_set(workdir, trained_victim):
    """Distill the synthetic attack set into Data/ with the trained victim
    (shared by every test that consumes a .mat attack set)."""
    modeldir, _ = trained_victim
    from geoa3_tpu.cli.gen_data_mat import build_parser as gp, main as gen_main

    gargs = gp().parse_args(
        [
            "--datadir", "synthetic",
            "--npoint", "64",
            "--max_out_num", "3",
            "--outdir", "Data",
            "--checkpoint", modeldir,
        ]
    )
    return gen_main(gargs)


def test_full_pipeline(workdir, trained_victim, distilled_set):
    modeldir, train_result = trained_victim

    # ---- 1. distilled attack set (fixture) ----
    mat_path = distilled_set
    assert os.path.isfile(mat_path)
    import scipy.io as sio

    d = sio.loadmat(mat_path)
    n_inst = d["data"].shape[0]
    assert n_inst > 0
    # distillation invariant: every kept instance is correctly classified
    # (reference gen_data_mat.py:250-263) — verified by construction; check
    # clean accuracy is 100% like the reference smoke test
    import jax, jax.numpy as jnp

    from geoa3_tpu.models.registry import build_model, make_eval_fn
    from geoa3_tpu.utils.checkpoint import load_victim_variables

    model = build_model("PointNet", 40, 64)
    variables = load_victim_variables(modeldir, arch="PointNet")
    logits_fn = make_eval_fn(model, variables)
    pcs = jnp.asarray(d["data"].transpose(0, 2, 1))
    preds = np.argmax(np.asarray(logits_fn(pcs)), -1)
    labels = d["label"].reshape(-1)
    assert (preds == labels).all(), "clean accuracy on the attack set must be 100%"

    # ---- 2. attack (tiny budget, untargeted) ----
    from geoa3_tpu.cli.main_attack import build_parser as ap, main as attack_main

    aargs = ap().parse_args(
        [
            "--attack", "GeoA3",
            "--attack_label", "Untarget",
            "--data_dir_file", mat_path,
            "--npoint", "64",
            "--binary_max_steps", "2",
            "--iter_max_steps", "30",
            "--curv_loss_knn", "4",
            "-b", "4",
            "--checkpoint", modeldir,
        ]
    )
    saved_dir = attack_main(aargs)
    assert os.path.isfile(os.path.join(saved_dir, "attack_result.txt"))
    txt = open(os.path.join(saved_dir, "attack_result.txt")).read()
    assert "attack success:" in txt
    rate = float(txt.strip().split(":")[1].strip())
    mats = os.listdir(os.path.join(saved_dir, "Mat"))
    objs = os.listdir(os.path.join(saved_dir, "PC"))
    assert len(mats) == len(objs)
    assert len(mats) >= round(rate / 100 * n_inst) - 1
    assert rate > 0, "at least some instances must be attacked successfully"

    # dir naming contract
    assert "GeoA3_0_BiStep2_IterStep30_Optadam" in saved_dir

    # ---- 3. defense on the attack outputs ----
    if mats:
        from geoa3_tpu.cli.defense import build_parser as dp, main as defense_main

        dargs = dp().parse_args(
            [
                "--datadir", os.path.join(saved_dir, "Mat"),
                "--npoint", "64",
                "--defense_type", "outliers_fixNum",
                "--drop_num", "8",
                "--checkpoint", modeldir,
            ]
        )
        dres = defense_main(dargs)
        assert os.path.isfile(os.path.join(saved_dir, "defense_result.txt"))
        assert 0 <= dres["final_acc"] <= 100

        # variance-type defense too (dynamic shapes path), with the obj-dump
        # recording path on (defended clouds kept only under this flag)
        dargs2 = dp().parse_args(
            [
                "--datadir", os.path.join(saved_dir, "Mat"),
                "--npoint", "64",
                "--defense_type", "outliers_variance",
                "--alpha", "1.1",
                "--checkpoint", modeldir,
                "--is_record_all",
            ]
        )
        defense_main(dargs2)
        defensed_dir = os.path.join(saved_dir, "Defensed")
        objs = [f for f in os.listdir(defensed_dir) if f.endswith(".obj")]
        assert len(objs) == len(mats)

    # ---- 4. smoothness metric over the Mat dir ----
    if mats:
        from geoa3_tpu.cli.smoothness import build_parser as sp, main as smooth_main

        sargs = sp().parse_args(
            ["--datadir", saved_dir, "--k", "8", "--k2", "8"]
        )
        avg = smooth_main(sargs)
        assert np.isfinite(avg)
        assert os.path.isfile(os.path.join(saved_dir, "metric", "k8.mat"))


def test_attack_bf16_victim_flag(workdir, trained_victim):
    """--victim_dtype bfloat16 drives the whole CLI path; success is still
    measured by the f32 victim re-evaluation."""
    modeldir, _ = trained_victim
    from geoa3_tpu.cli.main_attack import build_parser as ap, main as attack_main

    aargs = ap().parse_args(
        [
            "--attack", "GeoA3",
            "--attack_label", "Untarget",
            "--data_dir_file", "synthetic:2:64",
            "--npoint", "64",
            "--binary_max_steps", "1",
            "--iter_max_steps", "3",
            "--curv_loss_knn", "4",
            "-b", "4",
            "--checkpoint", modeldir,
            "--victim_dtype", "bfloat16",
            "--id", "7",
        ]
    )
    saved_dir = attack_main(aargs)
    assert os.path.isfile(os.path.join(saved_dir, "attack_result.txt"))


def test_eval_mode_no_attack(workdir, trained_victim, distilled_set):
    """--attack None evaluates clean accuracy (reference main_attack.py:212-224)."""
    modeldir, _ = trained_victim
    from geoa3_tpu.cli.main_attack import build_parser as ap, main as attack_main

    aargs = ap().parse_args(
        [
            "--data_dir_file", distilled_set,
            "--attack_label", "Untarget",
            "--npoint", "64",
            "-b", "4",
            "--checkpoint", modeldir,
        ]
    )
    saved_dir = attack_main(aargs)
    assert "Evaluating_0" in saved_dir


def test_attack_resume_start_batch(workdir, trained_victim):
    """--start_batch resumes a killed run: skipped batches keep the counters
    aligned, batches_done.txt tracks progress, and the final success rate is
    recounted from the saved per-instance .mat files of the WHOLE run."""
    modeldir, _ = trained_victim
    from geoa3_tpu.cli.main_attack import build_parser as ap, main as attack_main

    base = [
        "--attack", "GeoA3",
        "--attack_label", "Untarget",
        "--data_dir_file", "synthetic:4:64",
        "--npoint", "64",
        "--binary_max_steps", "1",
        "--iter_max_steps", "10",
        "--curv_loss_knn", "4",
        "-b", "8",
        "--checkpoint", modeldir,
        "--id", "9",
    ]
    saved_dir = attack_main(ap().parse_args(base))
    done = int(open(os.path.join(saved_dir, "batches_done.txt")).read())
    assert done >= 2
    full_rate = float(
        open(os.path.join(saved_dir, "attack_result.txt"))
        .read().strip().splitlines()[-1].split(":")[1]
    )
    n_mats = len(os.listdir(os.path.join(saved_dir, "Mat")))

    # resume from the last batch: the re-attacked tail may overwrite its own
    # mats but the recount must cover the whole run
    attack_main(ap().parse_args(base + ["--start_batch", str(done - 1)]))
    lines = open(os.path.join(saved_dir, "attack_result.txt")).read().strip()
    resumed_rate = float(lines.splitlines()[-1].split(":")[1])
    # unique (instance, target) success pairs can only stay or grow
    assert resumed_rate >= full_rate - 1e-6
    assert len(os.listdir(os.path.join(saved_dir, "Mat"))) >= n_mats

    # a FRESH run (no --start_batch) into the same experiment dir must
    # clear stale per-instance outputs first: the save names embed the
    # final predicted class, so a prediction flip would otherwise leave
    # two files for one instance and contaminate the authoritative
    # recount-from-dir (round-5 recert post-mortem)
    stale = os.path.join(saved_dir, "Mat", "adv_999_gt0_attack1_expect0.mat")
    open(stale, "wb").close()
    attack_main(ap().parse_args(base))
    assert not os.path.exists(stale)


def test_attack_margin_retry(workdir, trained_victim):
    """--margin_retry re-attacks failed pairs with the Margin loss and
    merges the successes (protocol measured at 96.9% on All-mode)."""
    modeldir, _ = trained_victim
    from geoa3_tpu.cli.main_attack import build_parser as ap, main as attack_main

    # targeted attacks at a tiny budget leave failures for the retry pass
    aargs = ap().parse_args(
        [
            "--attack", "GeoA3",
            "--attack_label", "All",
            "--data_dir_file", "synthetic:2:64",
            "--npoint", "64",
            "--binary_max_steps", "1",
            "--iter_max_steps", "10",
            "--curv_loss_knn", "4",
            "-b", "2",
            "--checkpoint", modeldir,
            "--margin_retry",
            "--id", "12",
        ]
    )
    saved_dir = attack_main(aargs)
    txt = open(os.path.join(saved_dir, "attack_result.txt")).read()
    assert "attack success:" in txt
    # the retry pass ran iff the CE pass left failures
    rate = float(txt.strip().splitlines()[0].split(":")[1])
    if rate < 100.0:
        assert "margin retry closed:" in txt


def test_attack_is_debug_dumps(workdir, trained_victim):
    """--is_debug writes per-search-step 6-column .xyz snapshots under Obj/
    (reference geoA3_attack.py:334-370 observability, per-search-step here)."""
    modeldir, _ = trained_victim
    from geoa3_tpu.cli.main_attack import build_parser as ap, main as attack_main

    aargs = ap().parse_args(
        [
            "--attack", "GeoA3",
            "--attack_label", "Untarget",
            "--data_dir_file", "synthetic:1:64",
            "--npoint", "64",
            "--binary_max_steps", "2",
            "--iter_max_steps", "10",
            "--curv_loss_knn", "4",
            "-b", "2",
            "--checkpoint", modeldir,
            "--is_debug",
            "--id", "13",
        ]
    )
    saved_dir = attack_main(aargs)
    dumps = sorted(os.listdir(os.path.join(saved_dir, "Obj")))
    assert any(f.endswith("_bs0.xyz") for f in dumps)
    assert any(f.endswith("_bs1.xyz") for f in dumps)
    rows = np.loadtxt(os.path.join(saved_dir, "Obj", dumps[0]))
    assert rows.shape == (64, 6)  # xyz + normal per point


def test_attack_with_save_normal(workdir, trained_victim):
    """--is_save_normal estimates normals against a dense cloud and stores
    them in the per-instance .mat (reference main_attack.py:241-247,269-271)."""
    import scipy.io as sio

    from geoa3_tpu.cli.main_attack import build_parser as ap, main as attack_main
    from geoa3_tpu.data.synthetic import make_synthetic_attack_set

    modeldir, _ = trained_victim
    # small attack set + a denser twin (same instances, more points)
    os.makedirs("Data", exist_ok=True)
    d = make_synthetic_attack_set(num_per_class=1, npoint=64, classes=2, seed=7)
    sio.savemat("Data/sn_set.mat", d)
    dense = make_synthetic_attack_set(num_per_class=1, npoint=128, classes=2, seed=7)
    sio.savemat("Data/sn_dense.mat", dense)

    aargs = ap().parse_args(
        [
            "--attack", "GeoA3",
            "--attack_label", "Untarget",
            "--data_dir_file", "Data/sn_set.mat",
            "--dense_data_dir_file", "Data/sn_dense.mat",
            "--is_save_normal",
            "--npoint", "64",
            "--binary_max_steps", "1",
            "--iter_max_steps", "15",
            "--curv_loss_knn", "4",
            "-b", "2",
            "--checkpoint", modeldir,
            "--id", "2",
        ]
    )
    saved_dir = attack_main(aargs)
    mats = os.listdir(os.path.join(saved_dir, "Mat"))
    if mats:  # normals stored for every success
        m = sio.loadmat(os.path.join(saved_dir, "Mat", mats[0]))
        assert "est_normal" in m
        assert m["est_normal"].shape == m["adversary_point_clouds"].shape
        norms = np.linalg.norm(m["est_normal"].T, axis=1)
        assert (norms > 0.5).all() and (norms < 1.5).all()
