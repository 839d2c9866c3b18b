"""RNG policy determinism + windowing edge cases."""

import jax
import numpy as np

from acoustic_image_generation_tpu.core import rng as rng_mod
from acoustic_image_generation_tpu.data.windowing import plan_windows


def test_rng_derivation_is_deterministic_and_distinct():
    k = rng_mod.experiment_key(7)
    a = rng_mod.train_step_rngs(k, 3)
    b = rng_mod.train_step_rngs(k, 3)
    c = rng_mod.train_step_rngs(k, 4)
    for role in ("latent", "moddrop", "dropout"):
        assert jax.random.key_data(a[role]).tolist() == jax.random.key_data(b[role]).tolist()
        assert jax.random.key_data(a[role]).tolist() != jax.random.key_data(c[role]).tolist()
    # roles are distinct at the same step
    assert (
        jax.random.key_data(a["latent"]).tolist()
        != jax.random.key_data(a["dropout"]).tolist()
    )


def test_rng_step_fold_traceable():
    k = rng_mod.experiment_key(0)

    @jax.jit
    def f(step):
        r = rng_mod.train_step_rngs(k, step)
        return jax.random.uniform(r["latent"], ())

    assert float(f(0)) != float(f(1))


def test_plan_windows_sliding_vs_strided(tmp_path):
    lst = tmp_path / "list.txt"
    files = [f"/d/class_0/data_001/Data_{i:03d}.tfrecord" for i in range(1, 6)]  # 5 s
    files += [f"/d/class_1/data_002/Data_{i:03d}.tfrecord" for i in range(1, 4)]  # 3 s
    lst.write_text("\n".join(files) + "\n")

    train = plan_windows(str(lst), "training", 2)
    # sliding stride 1: (5-2+1) + (3-2+1) = 4 + 2
    assert len(train.windows) == 6
    assert train.windows[0] == files[:2]
    assert train.windows[3] == files[3:5]
    # num_samples keeps the reference counting: floor(len/sample_length)
    assert train.num_samples == 2 + 1

    test = plan_windows(str(lst), "testing", 2)
    # strided non-overlapping: 2 + 1
    assert len(test.windows) == 3
    assert test.windows[1] == files[2:4]
    assert test.total_batches(2) == 2


def test_plan_windows_groups_by_parent_dir(tmp_path):
    lst = tmp_path / "list.txt"
    # interleaving parents must split groups (outdoor_data_mfcc.py:172-174)
    files = [
        "/d/a/data_001/Data_001.tfrecord",
        "/d/a/data_001/Data_002.tfrecord",
        "/d/a/data_002/Data_001.tfrecord",
    ]
    lst.write_text("\n".join(files) + "\n")
    plan = plan_windows(str(lst), "training", 2)
    # second video has only 1 record -> no window crosses the video boundary
    assert plan.windows == [files[:2]]
