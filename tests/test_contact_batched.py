"""contact_rows is a custom_vmap: the batched tracks-last plane
implementation must agree with the unbatched reference-shaped path on every
row field (reference semantics physics.h:451-489 have one code path; the
layout split is a TPU optimization and must be behavior-free)."""
import jax
import jax.numpy as jnp
import numpy as np

from hand_tracking_samples_tpu.assets_paths import DEFAULT_ANIMBANK
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.physics.contacts import contact_rows
from hand_tracking_samples_tpu.physics.solver import BodyState
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params


def _bank_states(golden):
    bank = load_animbank(DEFAULT_ANIMBANK)
    frames = [int(golden["contact_frame"][0])] + list(
        range(0, len(bank), max(1, len(bank) // 15)))[:15]
    rng = np.random.RandomState(3)
    return frames, BodyState(
        pose=jnp.asarray(bank[frames]),
        linear_momentum=jnp.asarray(
            rng.randn(len(frames), 17, 3).astype(np.float32) * 1e-3),
        angular_momentum=jnp.asarray(
            rng.randn(len(frames), 17, 3).astype(np.float32) * 1e-4))


def test_contact_kernel_matches_xla(golden, hand_model, monkeypatch):
    """The Pallas contact kernel (interpret mode on CPU) must reproduce the
    XLA batched path bit-for-bit on every row field; the kernel is the same
    SAT + refine + manifold math in a VMEM-resident layout."""
    _, states = _bank_states(golden)
    params = physics_params(TrackerConfig())

    monkeypatch.setenv("HTS_CONTACT_KERNEL", "0")
    xla = jax.jit(jax.vmap(
        lambda s: contact_rows(s, hand_model, params)))(states)
    xla = jax.tree.map(np.asarray, xla)
    monkeypatch.setenv("HTS_CONTACT_KERNEL", "1")
    ker = jax.jit(jax.vmap(
        lambda s: contact_rows(s, hand_model, params)))(states)
    ker = jax.tree.map(np.asarray, ker)

    act = xla.active > 0
    assert act.any()
    np.testing.assert_array_equal(act, ker.active > 0)
    for name in ("b0", "b1", "fmin", "fmax", "friction_master",
                 "friction_coef"):
        np.testing.assert_array_equal(getattr(xla, name),
                                      getattr(ker, name), err_msg=name)
    for name in ("normal", "r0", "r1", "targetdist", "targetspeednobias"):
        np.testing.assert_allclose(getattr(xla, name)[act],
                                   getattr(ker, name)[act],
                                   atol=1e-8, err_msg=name)


def test_batched_contacts_match_unbatched(golden, hand_model):
    bank = load_animbank(DEFAULT_ANIMBANK)
    frames = [int(golden["contact_frame"][0])] + list(
        range(0, len(bank), max(1, len(bank) // 15)))[:15]
    rng = np.random.RandomState(3)
    states = BodyState(
        pose=jnp.asarray(bank[frames]),
        linear_momentum=jnp.asarray(
            rng.randn(len(frames), 17, 3).astype(np.float32) * 1e-3),
        angular_momentum=jnp.asarray(
            rng.randn(len(frames), 17, 3).astype(np.float32) * 1e-4))
    params = physics_params(TrackerConfig())

    batched = jax.jit(jax.vmap(
        lambda s: contact_rows(s, hand_model, params)))(states)
    one = jax.jit(lambda s: contact_rows(s, hand_model, params))
    for t in range(len(frames)):
        ub = one(jax.tree.map(lambda x: x[t], states))
        for name in ("b0", "b1", "fmin", "fmax", "friction_master",
                     "friction_coef"):
            np.testing.assert_array_equal(
                np.asarray(getattr(batched, name))[t],
                np.asarray(getattr(ub, name)), err_msg=name)
        np.testing.assert_array_equal(np.asarray(batched.active)[t],
                                      np.asarray(ub.active))
        act = np.asarray(ub.active)
        for name in ("normal", "r0", "r1", "targetdist",
                     "targetspeednobias"):
            a = np.asarray(getattr(batched, name))[t][act]
            b = np.asarray(getattr(ub, name))[act]
            np.testing.assert_allclose(a, b, atol=2e-5, err_msg=name)
