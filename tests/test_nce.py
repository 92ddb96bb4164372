"""NCE loss golden tests against closed-form numpy (formulas from
criterions/nce.py:38-58) and Z-freeze semantics (nce.py:21-36)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from avid_cma_tpu.criterions.nce import nce_loss, resolve_partition


def numpy_nce(scores_pos, scores_neg, z):
    K = scores_neg.shape[1]
    ep, en = np.exp(scores_pos), np.exp(scores_neg)
    pmt = ep / (ep + K * z)
    pon = (K * z) / (en + K * z)
    return (-np.log(pmt).mean(-1) + -np.log(pon).sum(-1)).mean()


def test_nce_matches_closed_form(rng):
    sp = rng.normal(size=(4, 1)).astype(np.float32)
    sn = rng.normal(size=(4, 16)).astype(np.float32)
    z = np.float32(1.3)
    got = nce_loss(jnp.asarray(sp), jnp.asarray(sn), jnp.float32(z))
    want = numpy_nce(sp, sn, z)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_nce_multi_positive_mean(rng):
    """Multiple positives average their -log Pmt (mean over axis -1)."""
    sp = rng.normal(size=(4, 8)).astype(np.float32)
    sn = rng.normal(size=(4, 16)).astype(np.float32)
    z = np.float32(0.7)
    got = nce_loss(jnp.asarray(sp), jnp.asarray(sn), jnp.float32(z))
    np.testing.assert_allclose(np.asarray(got), numpy_nce(sp, sn, z), rtol=1e-4)


def test_partition_freeze_semantics(rng):
    exp_neg_1 = jnp.asarray(rng.uniform(0.5, 2.0, size=(4, 16)).astype(np.float32))
    exp_neg_2 = jnp.asarray(rng.uniform(5.0, 9.0, size=(4, 16)).astype(np.float32))

    z0 = jnp.float32(-1.0)
    z1 = resolve_partition(z0, exp_neg_1)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(exp_neg_1).mean(), rtol=1e-6)
    # second batch: frozen, ignores new scores
    z2 = resolve_partition(z1, exp_neg_2)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1))


def test_partition_all_reduced_over_mesh(mesh):
    """Z estimate is the global (cross-replica) mean, reference nce.py:26-33."""
    n_dev = mesh.size
    per_dev = 4
    vals = np.arange(n_dev * per_dev, dtype=np.float32).reshape(n_dev * per_dev, 1)

    def f(exp_neg):
        return resolve_partition(jnp.float32(-1.0), exp_neg, axis_name="data")

    z = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P())
    )(jnp.asarray(vals))
    np.testing.assert_allclose(np.asarray(z), vals.mean(), rtol=1e-6)


def test_nce_gradient_flows_through_positives_and_negatives(rng):
    sp = jnp.asarray(rng.normal(size=(2, 1)).astype(np.float32))
    sn = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    gp, gn = jax.grad(lambda a, b: nce_loss(a, b, jnp.float32(1.0)), argnums=(0, 1))(
        sp, sn
    )
    assert np.all(np.isfinite(np.asarray(gp))) and np.any(np.asarray(gp) != 0)
    assert np.all(np.isfinite(np.asarray(gn))) and np.any(np.asarray(gn) != 0)


def test_nce_stable_for_hard_positives():
    """A strongly anti-aligned positive (exp(score/T) ~ 1e-13) must keep
    a finite loss AND a live gradient — the direct-ratio form underflows
    to a clamp there, silently freezing learning on the hardest pairs.
    In the well-conditioned regime the log-space form matches the direct
    formula (test_nce_matches_closed_form); here only log-space survives."""
    sp = jnp.asarray([[-30.0]], jnp.float32)  # score/T for cosine ~ -1, T=0.07/2
    sn = jnp.asarray([[0.0, 1.0]], jnp.float32)
    z = jnp.float32(1.0)
    loss, grad = jax.value_and_grad(
        lambda s: nce_loss(s, sn, z)
    )(sp)
    # exact: softplus(log(2) + 30) ~ 30.69, and dL/ds_pos ~ -1
    assert np.isfinite(float(loss)) and float(loss) > 25.0
    assert float(grad[0, 0]) < -0.99
