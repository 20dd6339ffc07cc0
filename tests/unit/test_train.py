"""Unit tests for the WGAN-GP objective and fused train step.

SURVEY.md §4: "GP term ≈0 for a linear critic (analytic check)" — for
D(x) = w·x the gradient w.r.t. x is w everywhere, so the penalty is exactly
(‖w‖−1)² independent of the interpolation point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg.config import get_config
from sgg.train.losses import critic_loss, generator_loss, gradient_penalty
from sgg.train.state import create_train_state, param_count
from sgg.train.step import make_train_step, tau_schedule

B, R, F, V = 8, 9, 16, 24


def _rand_batch(rng, n_sub):
    r = np.random.RandomState(rng)
    return {
        "features": jnp.asarray(r.randn(n_sub, B, R, F), jnp.float32),
        "triples": jnp.asarray(r.randint(2, V, size=(n_sub, B, 3)), jnp.int32),
    }


def test_gradient_penalty_linear_critic_analytic():
    w = np.random.RandomState(0).randn(3, V).astype(np.float32)

    def critic_apply(params, feats, triple):
        return jnp.einsum("btv,tv->b", triple, params)

    real = jax.nn.one_hot(jnp.asarray(np.random.randint(0, V, (B, 3))), V)
    fake = jnp.full((B, 3, V), 1.0 / V)
    gp = gradient_penalty(
        critic_apply, jnp.asarray(w), jnp.zeros((B, R, F)), real, fake,
        jax.random.key(0),
    )
    expected = (np.linalg.norm(w) - 1.0) ** 2
    np.testing.assert_allclose(float(gp), expected, rtol=1e-4)

    # A critic with unit-norm weights ⇒ GP exactly 0.
    w_unit = w / np.linalg.norm(w)
    gp0 = gradient_penalty(
        critic_apply, jnp.asarray(w_unit), jnp.zeros((B, R, F)), real, fake,
        jax.random.key(1),
    )
    assert abs(float(gp0)) < 1e-6


def test_critic_and_generator_loss_signs():
    def critic_apply(params, feats, triple):
        # scores: real triples (one-hot rows ⇒ max prob 1) score higher
        return triple.max(axis=-1).sum(axis=-1) * params

    real = jax.nn.one_hot(jnp.asarray(np.random.randint(0, V, (B, 3))), V)
    fake = jnp.full((B, 3, V), 1.0 / V)
    feats = jnp.zeros((B, R, F))
    loss, aux = critic_loss(
        critic_apply, jnp.float32(1.0), feats, real, fake, jax.random.key(0),
        gp_lambda=0.0,
    )
    assert aux["w_dist"] > 0  # real scores above fake scores
    np.testing.assert_allclose(float(loss), -float(aux["w_dist"]), rtol=1e-6)
    g_loss, g_aux = generator_loss(critic_apply, jnp.float32(1.0), feats, fake)
    np.testing.assert_allclose(float(g_loss), -float(g_aux["g_fake_score"]), rtol=1e-6)


@pytest.fixture(scope="module")
def smoke_cfg():
    cfg = get_config("smoke")
    cfg.model.vocab_size = V
    cfg.data.regions = R
    cfg.data.feat_dim = F
    cfg.train.batch_size = B
    return cfg


def test_tau_schedule(smoke_cfg):
    cfg = smoke_cfg
    cfg.train.tau0, cfg.train.tau_min, cfg.train.tau_anneal = 2.0, 0.5, 0.1
    assert float(tau_schedule(cfg, jnp.int32(0))) == pytest.approx(2.0)
    assert float(tau_schedule(cfg, jnp.int32(10_000))) == pytest.approx(0.5)
    cfg.train.tau0, cfg.train.tau_min, cfg.train.tau_anneal = 1.0, 0.5, 0.0


def test_create_state_and_fused_step(smoke_cfg):
    state = create_train_state(smoke_cfg, jax.random.key(0))
    assert param_count(state.g_params) > 0
    step = make_train_step(smoke_cfg, donate=False)
    batch = _rand_batch(0, smoke_cfg.train.n_critic + 1)
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    for k in ("d_loss", "g_loss", "gp", "w_dist", "real_score", "fake_score"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    # params actually moved
    delta = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(
            jax.tree.leaves(state.g_params), jax.tree.leaves(new_state.g_params)
        )
    )
    assert delta > 0


def test_fused_step_deterministic(smoke_cfg):
    state = create_train_state(smoke_cfg, jax.random.key(0))
    step = make_train_step(smoke_cfg, donate=False)
    batch = _rand_batch(1, smoke_cfg.train.n_critic + 1)
    _, m1 = step(state, batch)
    _, m2 = step(state, batch)
    np.testing.assert_allclose(float(m1["d_loss"]), float(m2["d_loss"]), rtol=1e-6)


def test_step_mask_constrains_generated_tokens(smoke_cfg):
    """With a step mask, generated argmax tokens stay in the legal sets even
    through the full fused update path (mask folded into the program)."""
    mask = np.zeros((3, V), bool)
    mask[0, 2:12] = mask[2, 2:12] = True
    mask[1, 12:18] = True
    step = make_train_step(smoke_cfg, step_mask=mask, donate=False)
    state = create_train_state(smoke_cfg, jax.random.key(0))
    batch = _rand_batch(2, smoke_cfg.train.n_critic + 1)
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["d_loss"]))


def test_ema_off_by_default(smoke_cfg):
    assert smoke_cfg.train.ema_decay == 0.0
    state = create_train_state(smoke_cfg, jax.random.key(0))
    assert state.g_ema is None
    step = make_train_step(smoke_cfg, donate=False)
    new_state, _ = step(state, _rand_batch(3, smoke_cfg.train.n_critic + 1))
    assert new_state.g_ema is None


def test_ema_tracks_generator(smoke_cfg):
    """g_ema follows ema = d*ema + (1-d)*params exactly, step over step."""
    cfg = smoke_cfg
    cfg.train.ema_decay = 0.9
    try:
        state = create_train_state(cfg, jax.random.key(0))
        # Initialized from the init params.
        for e, p in zip(jax.tree.leaves(state.g_ema), jax.tree.leaves(state.g_params)):
            np.testing.assert_array_equal(np.asarray(e), np.asarray(p))
        step = make_train_step(cfg, donate=False)
        batch = _rand_batch(4, cfg.train.n_critic + 1)
        s1, _ = step(state, batch)
        for e0, p1, e1 in zip(
            jax.tree.leaves(state.g_ema),
            jax.tree.leaves(s1.g_params),
            jax.tree.leaves(s1.g_ema),
        ):
            want = 0.9 * np.asarray(e0, np.float64) + 0.1 * np.asarray(p1, np.float64)
            np.testing.assert_allclose(
                np.asarray(e1, np.float64), want, rtol=2e-5, atol=2e-6
            )
        # Second step compounds: EMA now differs from both init and params.
        s2, _ = step(s1, _rand_batch(5, cfg.train.n_critic + 1))
        for e1, p2, e2 in zip(
            jax.tree.leaves(s1.g_ema),
            jax.tree.leaves(s2.g_params),
            jax.tree.leaves(s2.g_ema),
        ):
            want = 0.9 * np.asarray(e1, np.float64) + 0.1 * np.asarray(p2, np.float64)
            np.testing.assert_allclose(
                np.asarray(e2, np.float64), want, rtol=2e-5, atol=2e-6
            )
    finally:
        cfg.train.ema_decay = 0.0


def test_reinforce_loss_matches_analytic_softmax_gradient():
    """Monte-Carlo correctness of the score-function estimator on a 1-slot
    categorical bandit: π = softmax(w), reward r[token]. The surrogate's
    gradient must match the analytic ∇w(−E[r]) = −p⊙(r − p·r). Fixed seed,
    N = 8192 samples → MC std per component ≲ 0.012; atol = 0.06 (5σ)."""
    from sgg.train.losses import reinforce_generator_loss

    Vb, N = 6, 8192
    w0 = jnp.asarray(np.random.RandomState(0).randn(Vb), jnp.float32)
    r_vec = jnp.asarray(np.random.RandomState(1).randn(Vb), jnp.float32)

    def critic_apply(d_params, feats, fake):
        return fake[:, 0, :] @ r_vec  # reward depends on slot-0 token only

    def surrogate(w):
        logits = jnp.broadcast_to(w, (N, Vb))
        u = jax.random.uniform(
            jax.random.key(7), (N, Vb), minval=1e-20, maxval=1.0
        )
        idx = jnp.argmax(logits - jnp.log(-jnp.log(u)), axis=-1)
        onehot = jax.lax.stop_gradient(jax.nn.one_hot(idx, Vb))
        fake = jnp.tile(onehot[:, None, :], (1, 3, 1))
        logp = jnp.take_along_axis(
            jax.nn.log_softmax(logits, -1), idx[:, None], axis=-1
        )[:, 0]
        loss, _ = reinforce_generator_loss(
            critic_apply, None, None, fake, logp
        )
        return loss

    est = np.asarray(jax.grad(surrogate)(w0))
    p = np.asarray(jax.nn.softmax(w0))
    analytic = -(p * (np.asarray(r_vec) - p @ np.asarray(r_vec)))
    np.testing.assert_allclose(est, analytic, atol=0.06)


def test_reinforce_constant_reward_gives_exactly_zero_grad():
    """The leave-one-out baseline makes the advantage EXACTLY zero under a
    constant reward, so no gradient leaks through log_prob. Reward 4.0 keeps
    the (Σr − rᵢ)/(B−1) arithmetic exact in float32 (32−4 = 28, 28/7 = 4)."""
    from sgg.train.losses import reinforce_generator_loss

    def critic_apply(d_params, feats, fake):
        return jnp.full((fake.shape[0],), 4.0)

    fake = jax.nn.one_hot(jnp.zeros((B, 3), jnp.int32), V)

    def loss(w):
        logp = jnp.tanh(w)  # any param-dependent log_prob stand-in
        return reinforce_generator_loss(critic_apply, None, None, fake, logp)[0]

    g = np.asarray(jax.grad(loss)(jnp.linspace(-1.0, 1.0, B)))
    np.testing.assert_array_equal(g, np.zeros(B))


def test_reinforce_estimator_step(smoke_cfg):
    """Full fused step with estimator='reinforce': runs, reports the RL
    metrics, and actually moves the generator parameters."""
    cfg = smoke_cfg
    cfg.train.estimator = "reinforce"
    cfg.train.rl_entropy = 0.01
    try:
        state = create_train_state(cfg, jax.random.key(0))
        step = make_train_step(cfg, donate=False)
        s1, m1 = step(state, _rand_batch(11, cfg.train.n_critic + 1))
        s2, m2 = step(s1, _rand_batch(12, cfg.train.n_critic + 1))
        for key in ("d_loss", "g_loss", "rl_surrogate", "rl_adv_std",
                    "rl_log_prob", "rl_entropy"):
            assert np.isfinite(float(m1[key])), key
            assert np.isfinite(float(m2[key])), key
        moved = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(jax.tree.leaves(state.g_params),
                            jax.tree.leaves(s2.g_params))
        )
        assert moved > 0
    finally:
        cfg.train.estimator = "gumbel"
        cfg.train.rl_entropy = 0.0


def test_unknown_estimator_raises(smoke_cfg):
    cfg = smoke_cfg
    cfg.train.estimator = "nope"
    try:
        with pytest.raises(ValueError, match="estimator"):
            make_train_step(cfg, donate=False)
    finally:
        cfg.train.estimator = "gumbel"


def _enc_cfg():
    cfg = get_config("smoke")
    cfg.model.encoder = "vgg19"
    cfg.model.vocab_size = V
    cfg.data.image_size = 32
    cfg.data.regions, cfg.data.feat_dim = 4, 512  # vgg19 @ 32px → [4, 512]
    cfg.train.batch_size = 2
    cfg.train.n_critic = 2
    return cfg


def _img_batch(rng, n_sub, b):
    r = np.random.RandomState(rng)
    return {
        "images": jnp.asarray(r.randint(0, 256, (n_sub, b, 32, 32, 3)), jnp.uint8),
        "triples": jnp.asarray(r.randint(2, V, (n_sub, b, 3)), jnp.int32),
    }


def test_train_encoder_updates_backbone():
    """train.train_encoder: the critic loss moves enc_params every critic
    iteration; with it off the same step leaves them bit-identical."""
    cfg = _enc_cfg()
    cfg.train.train_encoder = True
    state = create_train_state(cfg, jax.random.key(0))
    assert state.enc_opt_state is not None
    step = make_train_step(cfg, donate=False)
    batch = _img_batch(0, cfg.train.n_critic + 1, cfg.train.batch_size)
    s1, m = step(state, batch)
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
    assert float(m["enc_gnorm"]) > 0
    moved = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(state.enc_params),
                        jax.tree.leaves(s1.enc_params))
    )
    assert moved > 0

    frozen_cfg = _enc_cfg()  # train_encoder left False
    fstate = create_train_state(frozen_cfg, jax.random.key(0))
    assert fstate.enc_opt_state is None
    fstep = make_train_step(frozen_cfg, donate=False)
    f1, fm = fstep(fstate, batch)
    assert "enc_gnorm" not in fm
    for a, b in zip(jax.tree.leaves(fstate.enc_params),
                    jax.tree.leaves(f1.enc_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_encoder_requires_pixel_config(smoke_cfg):
    cfg = smoke_cfg
    cfg.train.train_encoder = True
    try:
        with pytest.raises(ValueError, match="train_encoder"):
            make_train_step(cfg, donate=False)
    finally:
        cfg.train.train_encoder = False


# ---- LR schedules + gradient clipping (sgg/train/state.py) ----------------

def _sched_cfg(**kw):
    cfg = get_config("smoke")
    cfg.model.vocab_size = V
    cfg.data.regions, cfg.data.feat_dim = R, F
    cfg.train.batch_size = B
    cfg.train.total_steps = 100
    for k, v in kw.items():
        setattr(cfg.train, k, v)
    return cfg


def test_lr_schedule_off_keeps_opt_state_structure():
    # The bit-compat contract: defaults build the SAME optimizer-state
    # pytree as plain optax.adam — existing checkpoints restore unchanged.
    import optax
    from sgg.train.state import make_optimizers

    cfg = _sched_cfg()
    g_tx, d_tx = make_optimizers(cfg)
    params = {"w": jnp.ones((3, 2))}
    ref = optax.adam(cfg.train.g_lr, b1=cfg.train.beta1,
                     b2=cfg.train.beta2).init(params)
    assert (jax.tree.structure(g_tx.init(params))
            == jax.tree.structure(ref))
    assert (jax.tree.structure(d_tx.init(params))
            == jax.tree.structure(ref))


def test_lr_schedule_shapes():
    from sgg.train.state import lr_schedule_fn

    cfg = _sched_cfg(lr_schedule="cosine", warmup_steps=10,
                     lr_final_frac=0.1, g_lr=1e-3)
    s = lr_schedule_fn(cfg, cfg.train.g_lr, updates_per_step=1)
    # warmup ramps up to peak at the end of warmup
    assert float(s(0)) == pytest.approx(1e-4, rel=1e-5)
    assert float(s(9)) == pytest.approx(1e-3, rel=1e-5)
    # cosine lands on the floor at total_steps
    assert float(s(100)) == pytest.approx(1e-4, rel=1e-4)
    # midpoint of the decay window [10, 100] is the cosine half-way point
    mid = float(s(55))
    assert 1e-4 < mid < 1e-3
    assert mid == pytest.approx((1e-3 + 1e-4) / 2, rel=1e-3)

    # linear: exact straight line
    cfg.train.lr_schedule = "linear"
    s = lr_schedule_fn(cfg, cfg.train.g_lr, updates_per_step=1)
    assert float(s(55)) == pytest.approx((1e-3 + 1e-4) / 2, rel=1e-4)

    # constant + warmup: flat at peak after the ramp
    cfg.train.lr_schedule = "constant"
    s = lr_schedule_fn(cfg, cfg.train.g_lr, updates_per_step=1)
    assert float(s(50)) == pytest.approx(1e-3, rel=1e-6)
    assert float(s(99)) == pytest.approx(1e-3, rel=1e-6)

    # n_critic horizon stretch: the critic's schedule in UPDATE counts
    # matches the generator's in train-step terms
    s5 = lr_schedule_fn(cfg, cfg.train.g_lr, updates_per_step=5)
    assert float(s5(49)) == pytest.approx(float(s(9)), rel=1e-5)


def test_lr_schedule_unknown_raises():
    from sgg.train.state import lr_schedule_fn

    cfg = _sched_cfg(lr_schedule="step")
    with pytest.raises(ValueError, match="lr_schedule"):
        lr_schedule_fn(cfg, 1e-3, 1)


def test_grad_clip_bounds_update():
    from sgg.train.state import make_optimizers

    cfg = _sched_cfg(grad_clip=1.0)
    g_tx, _ = make_optimizers(cfg)
    params = {"w": jnp.zeros((4,))}
    opt = g_tx.init(params)
    huge = {"w": jnp.full((4,), 1e6)}
    unit = {"w": jnp.full((4,), 0.5)}  # global norm 1.0
    up_huge, _ = g_tx.update(huge, opt, params)
    up_unit, _ = g_tx.update(unit, opt, params)
    # clipping rescales the huge gradient onto the unit sphere → identical
    # Adam updates for two gradients that only differ in magnitude
    np.testing.assert_allclose(np.asarray(up_huge["w"]),
                               np.asarray(up_unit["w"]), rtol=1e-6)


def test_fused_step_runs_with_schedule_and_clip():
    cfg = _sched_cfg(lr_schedule="cosine", warmup_steps=2, grad_clip=5.0)
    state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    batch = _rand_batch(0, cfg.train.n_critic + 1)
    s1, m = step(state, batch)
    assert int(s1.step) == 1
    assert np.isfinite(float(m["d_loss"]))
    # params actually moved
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.g_params),
                        jax.tree.leaves(s1.g_params))
    )
    assert moved


# ---- Gradient accumulation (train.grad_accum) ------------------------------

def test_accum_vg_exact_average():
    # Deterministic loss: accumulated grads must equal the full-batch
    # gradient of the mean loss exactly (same adds, reassociated).
    from sgg.train.step import _accum_vg

    params = jnp.asarray(np.random.RandomState(0).randn(F).astype(np.float32))
    x = jnp.asarray(np.random.RandomState(1).randn(B, F).astype(np.float32))

    def loss(p, xb):
        v = jnp.mean(jnp.sin(xb @ p) ** 2)
        return v, {"v": v}

    def vg(p, mb, k):
        del k
        return jax.value_and_grad(loss, has_aux=True)(p, mb[0])

    (full, fa), fg = vg(params, (x,), None)
    (acc, aa), ag = _accum_vg(vg, params, (x,), jax.random.key(0), 4)
    np.testing.assert_allclose(float(acc), float(full), rtol=1e-6)
    np.testing.assert_allclose(float(aa["v"]), float(fa["v"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ag), np.asarray(fg), rtol=1e-4, atol=1e-6
    )


def test_accum_vg_one_is_passthrough():
    # accum=1 must hand the UNSPLIT key through (bit-compat contract).
    from sgg.train.step import _accum_vg

    seen = {}

    def vg(p, mb, k):
        seen["key"] = k
        return (jnp.float32(0.0), {}), jnp.zeros_like(p)

    rng = jax.random.key(7)
    _accum_vg(vg, jnp.zeros((3,)), (jnp.zeros((B, 2)),), rng, 1)
    assert jax.random.key_data(seen["key"]).tolist() == (
        jax.random.key_data(rng).tolist()
    )


def test_fused_step_grad_accum_trains(smoke_cfg):
    import dataclasses

    cfg = dataclasses.replace(
        smoke_cfg, train=dataclasses.replace(smoke_cfg.train, grad_accum=4)
    )
    state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    batch = _rand_batch(0, cfg.train.n_critic + 1)
    s1, m = step(state, batch)
    assert int(s1.step) == 1
    for k in ("d_loss", "g_loss", "w_dist", "gp"):
        assert np.isfinite(float(m[k])), k
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.g_params),
                        jax.tree.leaves(s1.g_params))
    )
    assert moved


def test_grad_accum_must_divide_batch(smoke_cfg):
    import dataclasses

    cfg = dataclasses.replace(
        smoke_cfg, train=dataclasses.replace(smoke_cfg.train, grad_accum=3)
    )  # B=8 not divisible by 3
    state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    with pytest.raises(ValueError, match="grad_accum"):
        step(state, _rand_batch(0, cfg.train.n_critic + 1))


def test_grad_accum_one_bit_identical(smoke_cfg):
    # grad_accum=1 must reproduce the historical step EXACTLY.
    import dataclasses

    cfg1 = dataclasses.replace(
        smoke_cfg, train=dataclasses.replace(smoke_cfg.train, grad_accum=1)
    )
    state = create_train_state(smoke_cfg, jax.random.key(0))
    batch = _rand_batch(0, smoke_cfg.train.n_critic + 1)
    s_ref, m_ref = make_train_step(smoke_cfg, donate=False)(state, batch)
    s_acc, m_acc = make_train_step(cfg1, donate=False)(state, batch)
    for a, b in zip(jax.tree.leaves(s_ref.g_params),
                    jax.tree.leaves(s_acc.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(m_ref["d_loss"]), np.asarray(m_acc["d_loss"])
    )


def test_grad_accum_with_trainable_encoder():
    # The joint D+encoder microbatch path: backbone must still move and
    # metrics stay finite with accumulation on.
    cfg = _enc_cfg()
    cfg.train.train_encoder = True
    cfg.train.grad_accum = 2
    try:
        state = create_train_state(cfg, jax.random.key(0))
        step = make_train_step(cfg, donate=False)
        batch = _img_batch(0, cfg.train.n_critic + 1, cfg.train.batch_size)
        s1, m = step(state, batch)
        assert np.isfinite(float(m["d_loss"]))
        assert np.isfinite(float(m["enc_gnorm"]))
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(state.enc_params),
                            jax.tree.leaves(s1.enc_params))
        )
        assert moved
    finally:
        cfg.train.train_encoder = False
        cfg.train.grad_accum = 1


def test_train_encoder_moe_aux_reaches_objective():
    """train_encoder + MoE ViT: the Switch router load-balance loss sown by
    MoEMLP is collected into the joint critic+encoder objective (metrics
    carry a finite moe_aux) and its coefficient changes the encoder update
    (VERDICT r3 item 6 — previously the router trained unregularized)."""

    def moe_cfg(coef):
        cfg = get_config("smoke")
        cfg.model.encoder = "vit_b16"
        cfg.model.vit_dim, cfg.model.vit_layers, cfg.model.vit_heads = 32, 1, 2
        cfg.model.moe_experts = 2
        cfg.model.vocab_size = V
        cfg.data.image_size = 32
        cfg.data.regions, cfg.data.feat_dim = 4, 32
        cfg.train.batch_size = 2
        cfg.train.n_critic = 1
        cfg.train.train_encoder = True
        cfg.train.moe_aux_coef = coef
        return cfg

    batch = _img_batch(0, 2, 2)
    enc_after = []
    for coef in (0.0, 100.0):
        cfg = moe_cfg(coef)
        state = create_train_state(cfg, jax.random.key(0))
        step = make_train_step(cfg, donate=False)
        s1, m = step(state, batch)
        assert "moe_aux" in m
        aux = float(np.asarray(m["moe_aux"]).mean())
        assert np.isfinite(aux) and aux > 0
        assert np.isfinite(float(m["d_loss"]))
        enc_after.append(s1.enc_params)
    diff = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(enc_after[0]),
                        jax.tree.leaves(enc_after[1]))
    )
    assert diff > 0, "moe_aux_coef had no effect on the encoder update"
