"""Checkpoint IO: msgpack-serialized pytrees of numpy arrays.

Covers the reference's three checkpoint styles (SURVEY.md section 5 —
whole-model state dict, per-child dicts, raw state_dict) with one canonical
format; the rate point lives in the filename by convention
(``compression_{lambda}.msgpack``, mirroring LHBDC/encode_B.py:33).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, tree) -> None:
    tree = jax.tree.map(np.asarray, tree)
    blob = serialization.msgpack_serialize(tree)
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
