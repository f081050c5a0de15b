"""Multi-device (virtual 8-CPU mesh) tests: sharded train step parity with
single-device training, sharded VQ lookup parity, mesh factorization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finalproject_losslessimagecompression_tpu.models import (
    CouplingCfg,
    DenseBlockCfg,
    FlowCfg,
    IDFlow,
)
from finalproject_losslessimagecompression_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    mesh_shape_for,
    psum_counts,
    sharded_vq_lookup,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def small_cfg():
    return FlowCfg(
        H=8, W=8, C=3, nflows=2, nsplit=1,
        couple=CouplingCfg(0.75, DenseBlockCfg(8, 2, "LeakyReLU")),
        prior_nn=DenseBlockCfg(8, 2, "LeakyReLU"),
    )


class TestMesh:
    def test_factorization(self):
        assert mesh_shape_for(8) == (4, 2)
        assert mesh_shape_for(4) == (2, 2)
        assert mesh_shape_for(1) == (1, 1)
        assert mesh_shape_for(6) == (3, 2)

    def test_make_mesh(self):
        mesh = make_mesh()
        assert mesh.axis_names == ("data", "tile")
        assert mesh.devices.size == len(jax.devices())


class TestShardedTraining:
    def test_matches_single_device(self, rng):
        """One sharded step over the 8-device mesh must match the unsharded
        step bit-for-... well, closely (collective reduction order differs)."""
        import optax

        cfg = small_cfg()
        model = IDFlow(cfg)
        x = jnp.asarray(
            np.round(rng.uniform(0, 1, (8, 8, 8, 3)) * 256).astype(np.float32)
            / 256.0
        )
        params = model.init(jax.random.PRNGKey(0), x)
        opt = optax.adamax(1e-3)
        opt_state = opt.init(params)

        mesh = make_mesh()
        sharded = make_sharded_train_step(model, opt, mesh)
        p1, o1, loss1 = sharded(params, opt_state, x)

        from finalproject_losslessimagecompression_tpu.models.idflow import (
            log_likelihood,
        )

        def loss_fn(p, b):
            l, m, s = model.apply(p, b)
            lp, _ = log_likelihood(cfg, l, m, s)
            return -jnp.mean(lp)

        loss2, grads = jax.value_and_grad(loss_fn)(params, x)
        assert abs(float(loss1) - float(loss2)) < 1e-5

        upd, _ = opt.update(grads, opt_state, params)
        p2 = optax.apply_updates(params, upd)
        for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
        ):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestShardedVQ:
    def test_lookup_matches_dense(self, rng):
        mesh = make_mesh()
        K, D, N = 64, 16, 40
        cb = jnp.asarray(rng.normal(0, 1, (K, D)).astype(np.float32))
        x = jnp.asarray(rng.normal(0, 1, (N, D)).astype(np.float32))
        vq, idx = sharded_vq_lookup(x, cb, mesh, axis="tile")
        d = (
            np.sum(np.asarray(x) ** 2, 1, keepdims=True)
            + np.sum(np.asarray(cb) ** 2, 1)
            - 2 * np.asarray(x) @ np.asarray(cb).T
        )
        ref_idx = np.argmin(d, axis=1)
        assert np.array_equal(np.asarray(idx), ref_idx)
        assert np.allclose(np.asarray(vq), np.asarray(cb)[ref_idx])

    def test_psum_counts(self, rng):
        mesh = make_mesh()
        per_dev = jnp.asarray(
            rng.uniform(0, 1, (8, 32)).astype(np.float32)
        )
        out = psum_counts(per_dev, mesh)
        assert out.shape == (32,)
        assert np.allclose(np.asarray(out), np.asarray(per_dev).sum(0),
                           atol=1e-5)
