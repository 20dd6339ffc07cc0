"""recall@k semantics (SURVEY.md §2.1 #9)."""

import numpy as np

from sgg.eval.recall import corpus_recall, recall_at_k


def test_recall_basic():
    gt = [(1, 2, 3), (4, 5, 6)]
    gen = [(1, 2, 3), (7, 8, 9)]
    assert recall_at_k(gen, gt, k=50) == 0.5


def test_recall_dedupes_generated_before_topk():
    # 49 copies of a wrong triple + the right one at rank 50: dedup must
    # collapse the copies so the hit still lands inside the top-k window.
    gt = [(1, 2, 3)]
    gen = [(9, 9, 9)] * 49 + [(1, 2, 3)]
    assert recall_at_k(gen, gt, k=2) == 1.0
    # And duplicates must not multiply credit.
    gen2 = [(1, 2, 3)] * 10
    assert recall_at_k(gen2, gt, k=50) == 1.0


def test_recall_topk_cut_applies_after_dedup():
    gt = [(1, 2, 3)]
    gen = [(5, 5, 5), (6, 6, 6), (1, 2, 3)]
    assert recall_at_k(gen, gt, k=2) == 0.0  # rank 3 after dedup → outside k=2


def test_recall_empty_gt():
    assert recall_at_k([(1, 2, 3)], np.zeros((0, 3)), k=5) == 0.0


def test_corpus_recall_macro_average():
    gen = [[(1, 2, 3)], [(9, 9, 9)]]
    gt = [[(1, 2, 3)], [(4, 5, 6)]]
    assert corpus_recall(gen, gt, k=50) == 0.5


def test_corpus_recall_multi_matches_single_k():
    rng = np.random.RandomState(0)
    gen = [rng.randint(0, 6, size=(40, 3)) for _ in range(8)]
    gt = [rng.randint(0, 6, size=(5, 3)) for _ in range(8)]
    from sgg.eval.recall import corpus_recall_multi

    multi = corpus_recall_multi(gen, gt, ks=[2, 10, 50])
    for k in (2, 10, 50):
        assert multi[k] == corpus_recall(gen, gt, k=k)
    assert multi[2] <= multi[10] <= multi[50]  # monotone in k


def test_corpus_mean_recall_balances_predicates():
    from sgg.eval.recall import corpus_mean_recall

    # Predicate 1 dominates gt (3 triples, all recovered); predicate 2 has
    # one triple, missed. Plain recall@k = 3/4; mR@k averages classes: 0.5.
    gt = [[(1, 1, 2), (3, 1, 4), (5, 1, 6), (7, 2, 8)]]
    gen = [[(1, 1, 2), (3, 1, 4), (5, 1, 6)]]
    mr, table = corpus_mean_recall(gen, gt, k=50)
    assert mr == 0.5
    assert table[1] == (1.0, 3)
    assert table[2] == (0.0, 1)


def test_corpus_mean_recall_respects_topk_cut():
    from sgg.eval.recall import corpus_mean_recall

    gt = [[(1, 1, 2)]]
    gen = [[(9, 9, 9), (8, 8, 8), (1, 1, 2)]]  # hit at rank 3
    assert corpus_mean_recall(gen, gt, k=2)[0] == 0.0
    assert corpus_mean_recall(gen, gt, k=3)[0] == 1.0


def test_zero_shot_recall_filters_train_triples():
    from sgg.eval import corpus_zero_shot_recall

    # Image 0: GT {A, B}; A seen in training, B not. Generated hits both.
    A, B_ = (1, 2, 3), (4, 5, 6)
    gen = [[A, B_]]
    gt = [[A, B_]]
    zs, n = corpus_zero_shot_recall(gen, gt, {A}, [50])
    assert n == 1
    assert zs[50] == 1.0  # only B counts, and it was hit
    # Miss the zero-shot triple entirely:
    zs2, _ = corpus_zero_shot_recall([[A]], gt, {A}, [50])
    assert zs2[50] == 0.0


def test_zero_shot_recall_skips_images_without_unseen_gt():
    from sgg.eval import corpus_zero_shot_recall

    A, B_ = (1, 2, 3), (4, 5, 6)
    # Image 0 has only seen GT -> excluded from the macro average entirely.
    gen = [[A], [B_]]
    gt = [[A], [B_]]
    zs, n = corpus_zero_shot_recall(gen, gt, {A}, [10, 50])
    assert n == 1
    assert zs[10] == 1.0 and zs[50] == 1.0
    # No image has unseen GT:
    zs0, n0 = corpus_zero_shot_recall([[A]], [[A]], {A}, [50])
    assert n0 == 0 and zs0[50] == 0.0


def test_zero_shot_recall_respects_topk_cut():
    from sgg.eval import corpus_zero_shot_recall

    unseen = (9, 9, 9)
    filler = [(i, 0, 0) for i in range(10)]
    gen = [filler + [unseen]]  # unseen lands at rank 11
    gt = [[unseen]]
    zs, _ = corpus_zero_shot_recall(gen, gt, set(), [10, 20])
    assert zs[10] == 0.0 and zs[20] == 1.0


def test_predicate_recall_ranks():
    import pytest

    from sgg.eval import predicate_recall

    scores = np.array([
        [0.9, 0.5, 0.1, 0.0],  # gt 0 → rank 0
        [0.9, 0.5, 0.1, 0.0],  # gt 2 → rank 2
        [0.1, 0.1, 0.1, 0.1],  # gt 3, all tied → optimistic rank 0
    ])
    gt = np.array([0, 2, 3])
    r = predicate_recall(scores, gt, [1, 3])
    assert r[1] == pytest.approx(2 / 3)
    assert r[3] == pytest.approx(1.0)
    assert predicate_recall(np.zeros((0, 4)), np.zeros(0, int), [1]) == {1: 0.0}


def test_predcls_scorer_masks_and_determinism():
    """Scorer output: a log-distribution restricted to predicate-legal
    tokens, deterministic in the rng."""
    import jax

    from sgg.config import get_config
    from sgg.eval import make_predcls_scorer
    from sgg.train.state import create_train_state

    cfg = get_config("smoke")
    cfg.model.vocab_size = 12
    cfg.data.regions, cfg.data.feat_dim = 4, 8
    # step_mask: predicates legal only in tokens 6..9
    mask = np.zeros((3, 12), bool)
    mask[0, 2:6] = True
    mask[1, 6:10] = True
    mask[2, 2:6] = True
    state = create_train_state(cfg, jax.random.key(0))
    scorer = make_predcls_scorer(cfg, step_mask=mask, num_samples=3)
    feats = np.random.RandomState(0).randn(5, 4, 8).astype(np.float32)
    subj = np.array([2, 3, 4, 5, 2], np.int32)
    obj = np.array([3, 2, 5, 4, 3], np.int32)
    s1 = np.asarray(scorer(state.g_params, feats, subj, obj, jax.random.key(7)))
    s2 = np.asarray(scorer(state.g_params, feats, subj, obj, jax.random.key(7)))
    assert s1.shape == (5, 12)
    np.testing.assert_array_equal(s1, s2)
    # illegal predicate tokens carry ~zero probability
    assert s1[:, :6].max() < -1e4 and s1[:, 10:].max() < -1e4
    # legal region normalizes to ~1
    p = np.exp(s1[:, 6:10]).sum(axis=1)
    np.testing.assert_allclose(p, 1.0, rtol=1e-3)


def test_rank_triples_freq_matches_counter_most_common():
    """rank='freq' must reproduce the historical Counter.most_common order
    (count desc, ties by first-sampled) bit for bit."""
    from collections import Counter

    from sgg.eval import rank_triples

    rng = np.random.RandomState(3)
    tokens = rng.randint(0, 4, size=(64, 3))
    counts = Counter(tuple(int(x) for x in row) for row in tokens)
    expect = [t for t, _ in counts.most_common()]
    assert rank_triples(tokens) == expect


def test_rank_triples_logp_modes():
    from sgg.eval import rank_triples

    # a sampled twice (low prob), b once (high prob), c once (mid prob)
    a, b, c = (1, 1, 1), (2, 2, 2), (3, 3, 3)
    tokens = np.array([a, b, a, c])
    logp = np.array([-5.0, -1.0, -5.0, -3.0])
    # freq: count desc, tie first-seen → a, then b before c
    assert rank_triples(tokens, logp, rank="freq") == [a, b, c]
    # freq_logp: a leads on count; the 1-count tie breaks by logp → b, c
    assert rank_triples(tokens, logp, rank="freq_logp") == [a, b, c]
    # logp: aggregated mass a = logaddexp(-5,-5) ≈ -4.31 → b(-1), c(-3), a
    assert rank_triples(tokens, logp, rank="logp") == [b, c, a]
    # duplicate draws accumulate: 3 copies of c at -3 ≈ -1.90 overtake a(-4.31)
    tokens2 = np.array([a, a, c, c, c, b])
    logp2 = np.array([-5.0, -5.0, -3.0, -3.0, -3.0, -1.0])
    assert rank_triples(tokens2, logp2, rank="logp") == [b, c, a]
    import pytest

    with pytest.raises(ValueError):
        rank_triples(tokens, None, rank="logp")
    with pytest.raises(ValueError):
        rank_triples(tokens, logp, rank="bogus")


def _tiny_cfg(decoder="lstm"):
    from sgg.config import get_config

    cfg = get_config("smoke")
    cfg.model.decoder = decoder
    cfg.model.vocab_size = 12
    cfg.data.regions, cfg.data.feat_dim = 4, 8
    return cfg


def _step_mask12():
    mask = np.zeros((3, 12), bool)
    mask[0, 2:6] = True
    mask[1, 6:10] = True
    mask[2, 2:6] = True
    return mask


def test_with_logp_sampler_tokens_and_joint_logp():
    """with_logp=True: same tokens as the plain sampler for the same rng,
    and logp == the decoder's own conditional joint of those tokens
    (recomputed via a fully-forced decode) — both decoder families."""
    import jax

    from sgg.eval import make_sampler
    from sgg.train.state import create_train_state, make_models

    for decoder in ("lstm", "transformer"):
        cfg = _tiny_cfg(decoder)
        mask = _step_mask12()
        state = create_train_state(cfg, jax.random.key(0))
        feats = np.random.RandomState(0).randn(3, 4, 8).astype(np.float32)
        rng = jax.random.key(11)
        plain = np.asarray(
            make_sampler(cfg, step_mask=mask, num_samples=4)(
                state.g_params, feats, rng
            )
        )
        toks, logp = make_sampler(
            cfg, step_mask=mask, num_samples=4, with_logp=True
        )(state.g_params, feats, rng)
        toks, logp = np.asarray(toks), np.asarray(logp)
        np.testing.assert_array_equal(toks, plain)
        # legality under the step mask
        assert ((toks[..., 0] >= 2) & (toks[..., 0] < 6)).all()
        assert ((toks[..., 1] >= 6) & (toks[..., 1] < 10)).all()
        # exact oracle: replay the sampler's own key schedule through the
        # decoder's detach_sample mode and compare tokens AND log_prob
        gen, _ = make_models(cfg)
        keys = jax.random.split(rng, 4)
        for k in range(4):
            kz, kg = jax.random.split(keys[k])
            z = jax.random.normal(
                kz, (3, cfg.model.noise_dim), cfg.model.dtype
            )
            out = gen.apply(
                {"params": state.g_params}, feats, z, kg,
                step_mask=mask, detach_sample=True, sample_temp=1.0,
            )
            np.testing.assert_array_equal(
                np.asarray(out["tokens"]), toks[:, k]
            )
            np.testing.assert_allclose(
                np.asarray(out["log_prob"]), logp[:, k], rtol=1e-6
            )
        assert logp.shape == (3, 4)
        assert np.isfinite(logp).all() and (logp <= 0.0).all()


def test_sampling_temperature_is_real():
    """temp → 0 collapses every draw to the per-z mode; the old inert-τ
    behavior (all temperatures identical) must be gone."""
    import jax

    from sgg.eval import make_sampler
    from sgg.train.state import create_train_state

    cfg = _tiny_cfg("lstm")
    mask = _step_mask12()
    state = create_train_state(cfg, jax.random.key(0))
    feats = np.random.RandomState(1).randn(4, 4, 8).astype(np.float32)
    rng = jax.random.key(5)
    t_cold = np.asarray(
        make_sampler(cfg, step_mask=mask, num_samples=16, tau=1e-4)(
            state.g_params, feats, rng
        )
    )
    t_hot = np.asarray(
        make_sampler(cfg, step_mask=mask, num_samples=16, tau=50.0)(
            state.g_params, feats, rng
        )
    )
    # the knob does something
    assert not np.array_equal(t_cold, t_hot)
    # hot sampling spreads over strictly more unique triples than cold
    def n_unique(t):
        return sum(
            len({tuple(r) for r in t[b]}) for b in range(t.shape[0])
        )

    assert n_unique(t_hot) > n_unique(t_cold)
    # both stay inside the legal sub-vocabularies
    for t in (t_cold, t_hot):
        assert ((t[..., 0] >= 2) & (t[..., 0] < 6)).all()
        assert ((t[..., 1] >= 6) & (t[..., 1] < 10)).all()
        assert ((t[..., 2] >= 2) & (t[..., 2] < 6)).all()


def test_traced_temperature_matches_baked_and_mixes_per_row():
    """The trailing ``temp`` operand is bit-equivalent to baking the same
    value via ``tau`` at factory time, and a per-row float32[B] vector
    makes row i sample exactly as a whole-batch run at temp[i] — the
    property that lets the serve batcher coalesce mixed-temperature
    requests into one dispatch."""
    import jax

    from sgg.eval import make_sampler
    from sgg.train.state import create_train_state

    cfg = _tiny_cfg("lstm")
    mask = _step_mask12()
    state = create_train_state(cfg, jax.random.key(0))
    feats = np.random.RandomState(2).randn(4, 4, 8).astype(np.float32)
    rng = jax.random.key(7)

    default = make_sampler(cfg, step_mask=mask, num_samples=8)
    for T in (0.3, 1.0, 2.5):
        baked = np.asarray(
            make_sampler(cfg, step_mask=mask, num_samples=8, tau=T)(
                state.g_params, feats, rng
            )
        )
        # same compiled default-sampler program, temp as an operand
        traced = np.asarray(default(state.g_params, feats, rng, T))
        np.testing.assert_array_equal(traced, baked)

    # per-row vector: rows at different temperatures in ONE call equal the
    # corresponding rows of homogeneous whole-batch calls (the z/gumbel
    # noise depends only on (key, shape), which both share)
    t_lo = np.asarray(default(state.g_params, feats, rng, 0.3))
    t_hi = np.asarray(default(state.g_params, feats, rng, 2.5))
    vec = np.array([0.3, 2.5, 0.3, 2.5], np.float32)
    mixed = np.asarray(default(state.g_params, feats, rng, vec))
    np.testing.assert_array_equal(mixed[0], t_lo[0])
    np.testing.assert_array_equal(mixed[2], t_lo[2])
    np.testing.assert_array_equal(mixed[1], t_hi[1])
    np.testing.assert_array_equal(mixed[3], t_hi[3])

    # with_logp: logp stays the UNtempered joint of the tempered tokens —
    # hot rows may pick low-probability tokens but the reported number is
    # still a model log-probability (finite, ≤ 0)
    ws = make_sampler(cfg, step_mask=mask, num_samples=8, with_logp=True)
    toks, logp = (np.asarray(x) for x in
                  ws(state.g_params, feats, rng, vec))
    np.testing.assert_array_equal(toks, mixed)
    assert np.isfinite(logp).all() and (logp <= 0.0).all()


def test_assemble_scene_graphs_logp_ranking():
    from sgg.data.vocab import Vocab
    from sgg.eval import assemble_scene_graphs, rank_triples

    vocab = Vocab([f"t{i}" for i in range(6)], [True] * 6, [True] * 6)
    rng = np.random.RandomState(7)
    tokens = rng.randint(0, 6, size=(3, 20, 3))
    logp = rng.uniform(-8.0, -0.5, size=(3, 20)).astype(np.float32)
    for mode in ("freq_logp", "logp"):
        graphs, ids = assemble_scene_graphs(
            tokens, vocab, [10, 11, 12], logp=logp, rank=mode
        )
        for b in range(3):
            assert ids[b] == rank_triples(tokens[b], logp[b], rank=mode)
            assert all("logp" in t for t in graphs[b]["triples"])
    # default stays the batched lexicographic-tie ordering, no logp field
    graphs, _ = assemble_scene_graphs(tokens, vocab, [0, 1, 2])
    assert all("logp" not in t for g in graphs for t in g["triples"])


def test_rank_triples_predicate_logit_adjustment():
    from sgg.eval import rank_triples

    head = (1, 2, 1)  # predicate 2: common in training
    tail = (1, 3, 1)  # predicate 3: rare
    tokens = np.array([head, tail])
    logp = np.array([-2.0, -2.5])  # head slightly ahead on raw model prob
    assert rank_triples(tokens, logp, rank="logp") == [head, tail]
    # α·log-prior penalty: predicate 2 prior 0.9 vs predicate 3 prior 0.01
    adj = np.zeros(6)
    adj[2] = 1.0 * np.log(0.9)
    adj[3] = 1.0 * np.log(0.01)
    got = rank_triples(tokens, logp, rank="logp", pred_adjust=adj)
    assert got == [tail, head]  # tail promoted past the head predicate
    import pytest

    with pytest.raises(ValueError):
        rank_triples(tokens, logp, rank="freq", pred_adjust=adj)


def test_top_k_top_p_filter_semantics():
    """Unit semantics of the nucleus/top-k logit filter."""
    import jax.numpy as jnp

    from sgg.utils.gumbel import top_k_top_p_filter

    # probs [0.5, 0.3, 0.15, 0.05] (descending by construction)
    probs = np.array([0.5, 0.3, 0.15, 0.05])
    logits = jnp.asarray(np.log(probs), jnp.float32)[None, :]

    # top_k=2 keeps exactly the 2 largest
    out = np.asarray(top_k_top_p_filter(logits, top_k=2))
    assert (out[0, :2] > -1e8).all() and (out[0, 2:] <= -1e8).all()

    # nucleus p=0.5: smallest set reaching 0.5 is {token0}
    out = np.asarray(top_k_top_p_filter(logits, top_p=0.5))
    assert (out[0, 0] > -1e8) and (out[0, 1:] <= -1e8).all()
    # p=0.51 needs token1 too
    out = np.asarray(top_k_top_p_filter(logits, top_p=0.51))
    assert (out[0, :2] > -1e8).all() and (out[0, 2:] <= -1e8).all()
    # p=1.0 keeps everything (and leaves kept logits unchanged)
    out = np.asarray(top_k_top_p_filter(logits, top_p=1.0))
    np.testing.assert_allclose(out, np.asarray(logits), rtol=1e-6)

    # already-masked tokens (-1e9, the step-mask convention) stay masked
    masked = logits.at[0, 3].set(-1e9)
    out = np.asarray(top_k_top_p_filter(masked, top_p=1.0))
    assert out[0, 3] <= -1e8

    # k first, then p: k=2 renormalizes to [0.625, 0.375]; p=0.6 keeps {0}
    out = np.asarray(top_k_top_p_filter(logits, top_k=2, top_p=0.6))
    assert (out[0, 0] > -1e8) and (out[0, 1:] <= -1e8).all()


def test_sampler_top_k_one_is_greedy():
    """top_k=1 collapses the per-draw sampling to greedy argmax of the
    (z-conditioned) logits: for a FIXED noise vector the token is the
    logits' argmax and the sampling rng is irrelevant — both decoder
    families. (Across draws tokens still vary: z changes the logits.)"""
    import jax
    import jax.numpy as jnp

    from sgg.train.state import create_train_state, make_models

    mask = _step_mask12()
    for decoder in ("lstm", "transformer"):
        cfg = _tiny_cfg(decoder)
        state = create_train_state(cfg, jax.random.key(0))
        gen, _ = make_models(cfg)
        feats = jnp.asarray(
            np.random.RandomState(0).randn(3, 4, 8), jnp.float32
        )
        z = jnp.asarray(
            np.random.RandomState(1).randn(3, cfg.model.noise_dim),
            jnp.float32,
        )

        def toks(rng_int, **kw):
            out = gen.apply(
                {"params": state.g_params}, feats, z,
                jax.random.key(rng_int), tau=1.0, hard=True,
                step_mask=mask, **kw,
            )
            return np.asarray(out["tokens"]), np.asarray(out["logits"])

        t1, logits = toks(1, sample_top_k=1)
        t2, _ = toks(2, sample_top_k=1)
        np.testing.assert_array_equal(t1, t2)  # gumbel noise irrelevant
        np.testing.assert_array_equal(t1, logits.argmax(-1))  # greedy
        # without the filter, different rng keys DO change tokens
        u1, _ = toks(1)
        u2, _ = toks(2)
        assert (u1 != u2).any(), decoder
        legal = [set(np.where(mask[t])[0]) for t in range(3)]
        for t in range(3):
            assert set(t1[:, t].ravel()) <= legal[t], decoder


def test_sampler_top_p_restricts_support():
    """A tight nucleus must shrink the sampled support vs unfiltered
    sampling at the same rng budget, and never emit illegal tokens."""
    import jax

    from sgg.eval import make_sampler
    from sgg.train.state import create_train_state

    cfg = _tiny_cfg()
    mask = _step_mask12()
    state = create_train_state(cfg, jax.random.key(0))
    feats = np.random.RandomState(1).randn(2, 4, 8).astype(np.float32)
    full = make_sampler(cfg, step_mask=mask, num_samples=64)
    tight = make_sampler(cfg, step_mask=mask, num_samples=64, top_p=0.3)
    tf = np.asarray(full(state.g_params, feats, jax.random.key(3)))
    tt = np.asarray(tight(state.g_params, feats, jax.random.key(3)))
    # per (image, step): nucleus support is a subset-or-equal, usually
    # strictly smaller somewhere at an untrained (near-uniform) model
    n_full = sum(len(set(tf[b, :, t])) for b in range(2) for t in range(3))
    n_tight = sum(len(set(tt[b, :, t])) for b in range(2) for t in range(3))
    assert n_tight < n_full
    legal = [set(np.where(mask[t])[0]) for t in range(3)]
    for t in range(3):
        assert set(tt[:, :, t].ravel()) <= legal[t]


def test_corpus_recall_bootstrap_point_and_interval():
    """Point estimate matches corpus_recall_multi exactly; the percentile
    interval brackets it, is deterministic in seed, and collapses to zero
    width when every image has identical recall."""
    from sgg.eval import corpus_recall_bootstrap, corpus_recall_multi

    # 40 images: half fully recovered, half fully missed at k=2.
    hit = [[(1, 2, 3)], [(9, 9, 9)]]
    gen_hit = [(1, 2, 3), (4, 5, 6)]
    gen_miss = [(7, 7, 7), (8, 8, 8)]
    gen = [gen_hit] * 20 + [gen_miss] * 20
    gt = [hit[0]] * 20 + [hit[1]] * 20
    ks = [1, 2]
    cis = corpus_recall_bootstrap(gen, gt, ks, n_boot=2000, seed=0)
    point = corpus_recall_multi(gen, gt, ks)
    for k in ks:
        p, lo, hi = cis[k]
        assert p == point[k] == 0.5
        assert lo <= p <= hi
        # Binomial-ish spread for n=40, p=0.5: sd ≈ 0.079 → 95% CI well
        # inside [0.3, 0.7] but not degenerate.
        assert 0.25 < lo < 0.48 and 0.52 < hi < 0.75
    again = corpus_recall_bootstrap(gen, gt, ks, n_boot=2000, seed=0)
    assert again == cis  # deterministic in seed

    # Identical images -> zero-width interval at the point value.
    cis_const = corpus_recall_bootstrap(
        [gen_hit] * 10, [hit[0]] * 10, [2], n_boot=200, seed=0
    )
    assert cis_const[2] == (1.0, 1.0, 1.0)


def test_corpus_recall_bootstrap_empty_gt_weighting():
    """Images with empty GT stay in the denominator as zeros — the same
    weighting corpus_recall_multi uses — and empty corpora don't crash."""
    from sgg.eval import corpus_recall_bootstrap, corpus_recall_multi

    gen = [[(1, 2, 3)], [(1, 2, 3)]]
    gt = [[(1, 2, 3)], []]  # second image: no GT
    cis = corpus_recall_bootstrap(gen, gt, [1], n_boot=500, seed=3)
    assert cis[1][0] == corpus_recall_multi(gen, gt, [1])[1] == 0.5
    assert corpus_recall_bootstrap([], [], [1], n_boot=10) == {1: (0.0, 0.0, 0.0)}
