"""Argparse entry points mirroring the reference CLIs.

  python -m geoa3_tpu.cli.main_attack  (reference main_attack.py)
  python -m geoa3_tpu.cli.main_train   (reference main_train.py)
  python -m geoa3_tpu.cli.defense      (reference defense.py)
  python -m geoa3_tpu.cli.gen_data_mat (reference Provider/gen_data_mat.py)
  python -m geoa3_tpu.cli.smoothness   (reference Measurement/compute_data_smoothness.py)
"""
