"""Test harness: force an 8-virtual-device CPU mesh.

Multi-chip sharding is validated on fake CPU devices
(``--xla_force_host_platform_device_count=8``); real-TPU runs happen via
bench.py / the driver.  The axon sitecustomize force-registers the TPU
backend in every process, so the platform override must go through
jax.config *after* import.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from subgc_tpu.config import EvalConfig, ModelConfig  # noqa: E402
from subgc_tpu.models.params import init_params  # noqa: E402


# note att_feat_size must equal 2*gcn_dim: the reference feeds the 2L sGPN
# read-out through fc_embed=Linear(att_feat_size, ...) (AttModel.py:109)
TINY = ModelConfig(vocab_size=50, seq_length=16, rnn_size=64,
                   input_encoding_size=48, att_hid_size=32, gcn_dim=40,
                   fc_feat_size=64, att_feat_size=80, embed_dim=20,
                   num_obj_classes=30, num_rel_classes=10)


@pytest.fixture(scope="session")
def tiny_cfg():
    return TINY


@pytest.fixture(scope="session")
def tiny_params(tiny_cfg):
    params, state = init_params(jax.random.PRNGKey(0), tiny_cfg,
                                n_obj_names=30, n_pred_names=10)
    return params, state


@pytest.fixture()
def rng_np():
    return np.random.RandomState(0)
