"""Parallel layer: mesh helpers, TP shardings, distributed utils."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from imagharmony_tpu.models import unet
from imagharmony_tpu.parallel import distributed, mesh as mesh_lib, tp_rules


def test_make_mesh_axes():
    m = mesh_lib.make_mesh()
    assert m.axis_names == ("data", "model")
    assert m.devices.size == 8


def test_fit_data_mesh():
    assert mesh_lib.fit_data_mesh(2).devices.shape == (2, 1)
    assert mesh_lib.fit_data_mesh(8).devices.shape == (8, 1)
    assert mesh_lib.fit_data_mesh(3).devices.shape == (3, 1)
    assert mesh_lib.fit_data_mesh(7).devices.shape == (7, 1)


def test_tp_specs():
    col = tp_rules.tp_spec(("attn1", "to_q", "weight"), np.zeros((8, 16)))
    row = tp_rules.tp_spec(("attn1", "to_out", "weight"), np.zeros((16, 8)))
    rep = tp_rules.tp_spec(("norm1", "weight"), np.zeros((8,)))
    assert col == P(None, "model")
    assert row == P("model", None)
    assert rep == P()
    # conv kernels replicate
    assert tp_rules.tp_spec(("conv1", "weight"), np.zeros((3, 3, 8, 8))) == P()


def test_tp_sharded_unet_matches_replicated():
    """A 2-way TP UNet forward must equal the single-device result (GSPMD
    inserts the all-reduces; values identical up to fp summation order)."""
    cfg = unet.tiny_config()
    params = unet.init(0, cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    sample = jax.random.normal(ks[0], (2, 16, 16, 4))
    ctx = jax.random.normal(ks[1], (2, 8, cfg.cross_attention_dim))
    pooled = jax.random.normal(ks[2], (2, 32))
    tids = jnp.tile(jnp.array([[16.0, 16, 0, 0, 16, 16]]), (2, 1))

    from imagharmony_tpu import dtypes

    def fwd(p, s):
        return unet.apply(p, cfg, s, jnp.array([5, 9]), ctx,
                          pooled_text_embeds=pooled, time_ids=tids,
                          policy=dtypes.FP32)

    base = np.asarray(jax.jit(fwd)(params, sample))

    m = mesh_lib.make_mesh(n_data=4, n_model=2)
    with m:
        p_tp = tp_rules.shard_params_tp(m, params)
        out = np.asarray(jax.jit(fwd)(p_tp, sample))
    np.testing.assert_allclose(base, out, rtol=2e-4, atol=2e-4)


def test_distributed_single_host_noop():
    assert distributed.initialize() is False
    assert distributed.is_main_process()
    assert distributed.local_batch_slice(8) == slice(0, 8)
