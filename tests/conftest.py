"""Test configuration: force an 8-virtual-device CPU platform so mesh /
sharding paths are exercised without TPU hardware (the idiomatic JAX
multi-device test setup; see SURVEY.md §4)."""
import os

# NOTE: two traps here.
# 1. The environment force-sets JAX_PLATFORMS=axon (the TPU tunnel), so
#    this must be an overwrite, not a setdefault.
# 2. `import pytest` already imported jax (jaxtyping registers a pytest
#    plugin), and jax snapshots JAX_PLATFORMS at import — so the env var
#    alone is too late; jax.config.update is required. XLA_FLAGS is read
#    lazily at first backend init, so setting it here still works.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual-CPU platform, not the TPU tunnel")
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import json
import random

import numpy as np
import pytest

from sign_language_nlp_tpu.utils.jaxtools import setup_compilation_cache

setup_compilation_cache()

# Vocabulary of plausible phonological attribute values per field kind.
_ORIENTATIONS = ["left", "right", "up", "down", "front", "back",
                 "left_back", "left_down_front", "right_up", "down_front"]
_MOVEMENTS = ["left", "right", "up_down", "front_back", "left_down_front",
              "circular", "none"]
_HANDSHAPES = ["L", "A", "B", "C", "five", "one", "flat_b", "open_a"]

FIELDS = ["orientation_dh", "orientation_ndh", "movement_dh",
          "movement_ndh", "handshape_dh", "handshape_ndh"]


def make_sample(rng: random.Random, label: str, n_frames: int) -> dict:
    def field_value(kind):
        if rng.random() < 0.15:
            return None  # nulls appear in real ASL-Phono files
        pool = {"orientation": _ORIENTATIONS, "movement": _MOVEMENTS,
                "handshape": _HANDSHAPES}[kind]
        return {"value": rng.choice(pool)}

    frames = []
    for _ in range(n_frames):
        frame = {}
        for f in FIELDS:
            kind = f.split("_")[0]
            frame[f] = field_value(kind)
        frames.append(frame)
    return {"label": label, "frames": {"phonology": frames}}


@pytest.fixture(scope="session")
def asl_corpus_dir(tmp_path_factory):
    """A synthetic ASL-Phono-shaped corpus directory: per-sample JSON
    files named `<label>-<id>.json` (data-format contract per
    SURVEY.md §2)."""
    root = tmp_path_factory.mktemp("asl_phono")
    rng = random.Random(0)
    labels = ["house", "book", "friend", "love", "help",
              "water", "eat", "go", "rare"]
    counts = {"house": 9, "book": 8, "friend": 7, "love": 6, "help": 5,
              "water": 4, "eat": 3, "go": 2, "rare": 1}  # 'rare' < min_freq 2
    for label in labels:
        for i in range(counts[label]):
            sample = make_sample(rng, label, n_frames=rng.randint(5, 40))
            path = root / f"{label}-{i:03d}.json"
            path.write_text(json.dumps(sample))
    return str(root)


@pytest.fixture(scope="session")
def built_dataset(asl_corpus_dir):
    from sign_language_nlp_tpu.data import AslDataset

    return AslDataset.build(dataset_args={
        "dataset_dir": asl_corpus_dir,
        "fields": FIELDS,
        "samples_min_freq": 2,
        "composition_strategy": "as_words",
        "reuse_transient": False,
    })


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(0)
