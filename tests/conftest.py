"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env BEFORE jax is imported anywhere (SURVEY.md §7 step 9).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize pre-imports jax with JAX_PLATFORMS=axon before
# conftest runs; backend selection is still lazy, so this override wins as
# long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_vocab():
    words = ["a", "dog", "runs", "in", "park", "cat", "sits", "on", "mat",
             "man", "rides", "bike", "red", "blue"]
    words += ["<start>", "<end>", "<unk>", "<null>"]
    return {w: i for i, w in enumerate(words)}


@pytest.fixture(scope="session")
def synthetic_coco(tmp_path_factory):
    from depth_image_captioning_pub_tpu.data.synthetic import make_synthetic_coco
    out = tmp_path_factory.mktemp("coco")
    img_dir, ann_file = make_synthetic_coco(str(out), num_images=8, seed=0)
    return img_dir, ann_file
