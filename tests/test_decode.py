"""Decoding tests: greedy, beam, and the exactness invariants from
SURVEY.md §4 (greedy == beam(k=1); beam optimality on an exhaustive toy
search space)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stvd.data.batching import gather_batch, synthetic_dataset
from stvd.data.text import EOS_ID
from stvd.decode.beam import beam_decode
from stvd.decode.greedy import greedy_decode
from stvd.model.decoder import forward_train, init_params

from conftest import small_cfg


def _setup(cfg, n=4, seed=0):
    ds = synthetic_dataset(n_videos=n, k=cfg.n_frames, d=cfg.ctx_dim,
                           n_regions=cfg.n_regions if cfg.use_spatial else 0,
                           region_dim=cfg.region_dim, maxlen=10, seed=seed)
    dev = ds.bank.to_device()
    idx = np.arange(n, dtype=np.int32)
    batch = gather_batch(dev, ds.captions, idx)
    params = init_params(jax.random.PRNGKey(7), cfg)
    return params, batch


def test_greedy_shapes_and_termination(cfg):
    params, batch = _setup(cfg)
    out = greedy_decode(params, cfg, batch, maxlen=8)
    assert out.tokens.shape == (4, 8)
    toks = np.asarray(out.tokens)
    # after the first EOS, everything is EOS (= 0)
    for row in toks:
        hit = np.where(row == EOS_ID)[0]
        if hit.size:
            assert np.all(row[hit[0]:] == EOS_ID)


def test_beam_k1_equals_greedy(cfg):
    params, batch = _setup(cfg)
    g = greedy_decode(params, cfg, batch, maxlen=8)
    b = beam_decode(params, cfg, batch, beam_size=1, maxlen=8,
                    norm_mode="none")
    np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(b.tokens))
    np.testing.assert_allclose(np.asarray(g.scores), np.asarray(b.scores),
                               rtol=1e-5, atol=1e-5)


def test_beam_k1_equals_greedy_spatial(spatial_cfg):
    params, batch = _setup(spatial_cfg)
    g = greedy_decode(params, spatial_cfg, batch, maxlen=8)
    b = beam_decode(params, spatial_cfg, batch, beam_size=1, maxlen=8,
                    norm_mode="none")
    np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(b.tokens))


def _score_sequences(params, cfg, batch, seqs, maxlen):
    """Teacher-forced raw log-prob of explicit token sequences (scores a
    path up to and including its first EOS, or all maxlen steps if none)."""
    B = len(seqs)
    toks = np.zeros((B, maxlen), np.int32)
    mask = np.zeros((B, maxlen), np.float32)
    for i, s in enumerate(seqs):
        L = maxlen
        for t, w in enumerate(s):
            toks[i, t] = w
            if w == EOS_ID:
                L = t + 1
                break
        mask[i, :L] = 1.0
    one = {k: jnp.repeat(v[:1], B, axis=0) for k, v in batch.items()
           if k in ("frames", "frame_mask", "regions", "motion")}
    one["tokens"] = jnp.asarray(toks)
    one["token_mask"] = jnp.asarray(mask)
    out = forward_train(params, cfg, one, train=False)
    return -np.asarray(out.nll_per_example)


def test_beam_exact_on_exhaustive_space():
    """With beam k == V^(maxlen-1) the search is exhaustive, so the best
    beam must equal the brute-force best path (reference gen_sample is
    approximate host-side search; this pins our on-device version)."""
    cfg = small_cfg(n_words=5, dim_word=8, dim=12, ctx_dim=16, n_frames=4)
    maxlen, V = 3, 5
    params, batch = _setup(cfg)
    one = {k: v[:1] for k, v in batch.items()}
    b = beam_decode(params, cfg, one, beam_size=V * V, maxlen=maxlen,
                    norm_mode="none")
    paths = list(itertools.product(range(V), repeat=maxlen))
    scores = _score_sequences(params, cfg, one, paths, maxlen)
    best_brute = float(scores.max())
    np.testing.assert_allclose(float(b.scores[0]), best_brute, rtol=1e-4,
                               atol=1e-4)


def test_beam_emitted_score_matches_teacher_forced_rescore(cfg):
    """The raw score the beam reports must equal re-scoring its emitted
    tokens with the training forward (train/decode share the step fn)."""
    params, batch = _setup(cfg)
    b = beam_decode(params, cfg, batch, beam_size=3, maxlen=8,
                    norm_mode="none")
    toks = np.asarray(b.tokens)
    for i in range(toks.shape[0]):
        one = {k: v[i:i + 1] for k, v in batch.items()}
        s = _score_sequences(params, cfg, one, [toks[i].tolist()], 8)
        np.testing.assert_allclose(float(b.scores[i]), float(s[0]),
                                   rtol=1e-4, atol=1e-4)


def test_greedy_return_alphas(cfg):
    """Attention maps: each emitted step's alpha sums to 1 over valid
    frames; steps never reached (post-early-exit) stay zero."""
    params, batch = _setup(cfg)
    out = greedy_decode(params, cfg, batch, maxlen=8, return_alphas=True)
    a = np.asarray(out.alphas)
    assert a.shape == (4, 8, cfg.n_frames)
    sums = a.sum(axis=-1)
    for i in range(4):
        L = int(np.asarray(out.lengths)[i])
        covered = min(L + 1, 8)  # steps actually executed
        np.testing.assert_allclose(sums[i, :covered], 1.0, rtol=1e-5)


def test_topk_rows_chunked_exact():
    from stvd.decode.beam import _topk_rows
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(12, 48), jnp.float32)
    v0, i0 = _topk_rows(x, 5, chunks=1)
    for chunks in (2, 4, 6):
        v, i = _topk_rows(x, 5, chunks=chunks)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v0))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i0))


def test_beam_topk_chunks_equivalent(cfg):
    params, batch = _setup(cfg)
    a = beam_decode(params, cfg, batch, beam_size=3, maxlen=8)
    b = beam_decode(params, cfg, batch, beam_size=3, maxlen=8,
                    topk_chunks=4)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


@pytest.mark.parametrize("mode", ["flat", "onehot"])
def test_beam_gather_variants_exact(cfg, mode):
    """The three parent-state reorder lowerings (model.beam_gather) are
    token/score-exact against the take_along_axis reference: 'flat'
    (the production default, battery r4g) is the same gather on a
    flattened view; 'onehot' multiplies by a 0/1 permutation matrix
    with f32 accumulate (1.0*x + 0.0*rest == x bitwise, and the
    bf16->f32->bf16 round-trip of an unchanged value is exact)."""
    import dataclasses

    params, batch = _setup(cfg)
    ref_cfg = dataclasses.replace(cfg, beam_gather="take")
    ref = beam_decode(params, ref_cfg, batch, beam_size=3, maxlen=8)
    alt_cfg = dataclasses.replace(cfg, beam_gather=mode)
    alt = beam_decode(params, alt_cfg, batch, beam_size=3, maxlen=8)
    np.testing.assert_array_equal(np.asarray(ref.all_tokens),
                                  np.asarray(alt.all_tokens))
    np.testing.assert_array_equal(np.asarray(ref.all_scores),
                                  np.asarray(alt.all_scores))
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(alt.lengths))


@pytest.mark.parametrize("maxlen", [8, 30])
def test_beam_backptr_exact(cfg, maxlen):
    """beam_buf='backptr' (write word+parent, backtrack once after the
    loop) reproduces the reorder scheme's full (B, k, maxlen) token
    buffer bitwise — including the early-exit region (identity parents
    keep the slot fixed through never-executed steps) and EOS padding
    of finished beams.  maxlen=30 forces the early-exit path on the
    tiny fixtures; maxlen=8 exercises truncation."""
    import dataclasses

    params, batch = _setup(cfg)
    ref = beam_decode(params, cfg, batch, beam_size=3, maxlen=maxlen)
    alt_cfg = dataclasses.replace(cfg, beam_buf="backptr")
    alt = beam_decode(params, alt_cfg, batch, beam_size=3, maxlen=maxlen)
    np.testing.assert_array_equal(np.asarray(ref.all_tokens),
                                  np.asarray(alt.all_tokens))
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(alt.tokens))
    np.testing.assert_array_equal(np.asarray(ref.all_scores),
                                  np.asarray(alt.all_scores))
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(alt.lengths))


def test_decode_deterministic(cfg):
    """Same params + features -> identical tokens across invocations
    (production serving requirement; no hidden RNG in decode)."""
    params, batch = _setup(cfg)
    a = beam_decode(params, cfg, batch, beam_size=3, maxlen=8)
    b = beam_decode(params, cfg, batch, beam_size=3, maxlen=8)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(a.scores), np.asarray(b.scores))


def test_length_norm_modes(cfg):
    params, batch = _setup(cfg)
    for mode, alpha in (("gnmt", 0.6), ("linear", 0.0), ("none", 0.0)):
        out = beam_decode(params, cfg, batch, beam_size=3, maxlen=8,
                          length_norm=alpha, norm_mode=mode)
        assert np.isfinite(np.asarray(out.norm_scores)).all()


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_beam_exact_fuzz(seed):
    """Property fuzz: exhaustive beam (k=V^(L-1)) == brute force best
    path across random model initializations."""
    cfg = small_cfg(n_words=5, dim_word=8, dim=12, ctx_dim=16, n_frames=4)
    maxlen, V = 3, 5
    ds = synthetic_dataset(n_videos=2, k=cfg.n_frames, d=cfg.ctx_dim,
                           maxlen=8, seed=seed)
    dev = ds.bank.to_device()
    batch = gather_batch(dev, ds.captions, np.arange(2, dtype=np.int32))
    params = init_params(jax.random.PRNGKey(seed), cfg)
    one = {k: v[:1] for k, v in batch.items()}
    b = beam_decode(params, cfg, one, beam_size=V * V, maxlen=maxlen,
                    norm_mode="none")
    paths = list(itertools.product(range(V), repeat=maxlen))
    scores = _score_sequences(params, cfg, one, paths, maxlen)
    np.testing.assert_allclose(float(b.scores[0]), float(scores.max()),
                               rtol=1e-4, atol=1e-4)


def test_sample_temperature_zero_is_exact_greedy(cfg):
    """temperature == 0.0 short-circuits to argmax: bit-identical to
    greedy_decode (reference gen_sample argmax=True/False switch)."""
    from stvd.decode.sample import sample_decode
    params, batch = _setup(cfg)
    g = greedy_decode(params, cfg, batch, maxlen=8)
    s = sample_decode(params, cfg, batch, jax.random.PRNGKey(3), maxlen=8,
                      temperature=0.0)
    np.testing.assert_array_equal(np.asarray(g.tokens),
                                  np.asarray(s.tokens[:, 0]))
    np.testing.assert_allclose(np.asarray(g.scores),
                               np.asarray(s.scores[:, 0]), rtol=1e-5)


def test_sample_low_temperature_converges_to_greedy(cfg):
    """temperature -> 0 concentrates the multinomial on the argmax.
    (1e-6 scales the tiny random-init logit gaps far past the Gumbel
    noise range; an untrained model has near-tie logits.)"""
    from stvd.decode.sample import sample_decode
    params, batch = _setup(cfg)
    g = greedy_decode(params, cfg, batch, maxlen=8)
    s = sample_decode(params, cfg, batch, jax.random.PRNGKey(5), maxlen=8,
                      temperature=1e-6)
    np.testing.assert_array_equal(np.asarray(g.tokens),
                                  np.asarray(s.tokens[:, 0]))


def test_sample_shapes_rng_determinism(cfg):
    from stvd.decode.sample import sample_decode
    params, batch = _setup(cfg)
    a = sample_decode(params, cfg, batch, jax.random.PRNGKey(1), maxlen=8,
                      temperature=1.0, n_samples=3)
    assert a.tokens.shape == (4, 3, 8) and a.scores.shape == (4, 3)
    b = sample_decode(params, cfg, batch, jax.random.PRNGKey(1), maxlen=8,
                      temperature=1.0, n_samples=3)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    # EOS-termination invariant holds for every sample
    toks = np.asarray(a.tokens).reshape(-1, 8)
    for row in toks:
        hit = np.where(row == EOS_ID)[0]
        if hit.size:
            assert np.all(row[hit[0]:] == EOS_ID)


def test_sample_topk1_equals_greedy(cfg):
    """top_k=1 truncation leaves only the argmax to sample."""
    from stvd.decode.sample import sample_decode
    params, batch = _setup(cfg)
    g = greedy_decode(params, cfg, batch, maxlen=8)
    s = sample_decode(params, cfg, batch, jax.random.PRNGKey(9), maxlen=8,
                      temperature=1.0, top_k=1)
    np.testing.assert_array_equal(np.asarray(g.tokens),
                                  np.asarray(s.tokens[:, 0]))


def test_sample_score_matches_teacher_forced_rescore(cfg):
    """Sampled-sequence scores are UN-tempered model log-probs."""
    from stvd.decode.sample import sample_decode
    params, batch = _setup(cfg)
    s = sample_decode(params, cfg, batch, jax.random.PRNGKey(2), maxlen=8,
                      temperature=0.8)
    toks = np.asarray(s.tokens[:, 0])
    for i in range(toks.shape[0]):
        one = {k: v[i:i + 1] for k, v in batch.items()}
        r = _score_sequences(params, cfg, one, [toks[i].tolist()], 8)
        np.testing.assert_allclose(float(s.scores[i, 0]), float(r[0]),
                                   rtol=1e-4, atol=1e-4)


def test_beam_larger_k_no_worse_raw_score():
    """k=25 is exhaustive for maxlen=3/V=5, so it must be >= k=2's best."""
    cfg = small_cfg(n_words=5, dim_word=8, dim=12, ctx_dim=16, n_frames=4)
    params, batch = _setup(cfg)
    one = {k: v[:1] for k, v in batch.items()}
    b2 = beam_decode(params, cfg, one, beam_size=2, maxlen=3, norm_mode="none")
    b25 = beam_decode(params, cfg, one, beam_size=25, maxlen=3, norm_mode="none")
    assert float(b25.scores[0]) >= float(b2.scores[0]) - 1e-5


def test_int8_decode_matches_bf16_on_trained_model():
    """W8A8 dynamic quantization of the decode gates matmul
    (model.decode_quant='int8', the opt-in serving speedup): on a model
    with real decision margins (briefly trained), greedy tokens match
    the unquantized path."""
    import dataclasses
    from stvd.config import TrainConfig
    from stvd.train.loop import init_train_state, make_train_step
    cfg = small_cfg(compute_dtype="float32")
    ds = synthetic_dataset(n_videos=8, k=cfg.n_frames, d=cfg.ctx_dim,
                           maxlen=10, seed=3)
    dev = ds.bank.to_device()
    batch = gather_batch(dev, ds.captions, np.arange(8, dtype=np.int32))
    batch["weight"] = jnp.ones((8,), jnp.float32)
    tcfg = TrainConfig(batch_size=8, maxlen=10, optimizer="adam", lr=2e-3)
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_train_step(cfg, tcfg)
    for _ in range(60):
        state, _ = step(state, batch)
    dec = {k: v for k, v in batch.items() if k in ("frames", "frame_mask")}
    ref = greedy_decode(state["params"], cfg, dec, maxlen=10)
    cfg_q = dataclasses.replace(cfg, decode_quant="int8")
    q = greedy_decode(state["params"], cfg_q, dec, maxlen=10)
    agree = (np.asarray(ref.tokens) == np.asarray(q.tokens)).mean()
    assert agree >= 0.9, f"int8 token agreement {agree}"
    # beam path also runs under quantization
    bq = beam_decode(state["params"], cfg_q, dec, beam_size=3, maxlen=10)
    assert np.isfinite(np.asarray(bq.scores)).all()


def test_int8_config_never_quantizes_training():
    """decode_quant='int8' is a serving knob: the scheduled-sampling
    training forward (which runs the fused-gates step) must NOT route
    through the zero-gradient quantization ops — gates grads stay
    nonzero (code-review regression: quant round/clip have zero grad
    a.e. and silently stalled training)."""
    import dataclasses
    import jax
    from stvd.model.decoder import forward_train
    cfg = dataclasses.replace(small_cfg(compute_dtype="float32"),
                              decode_quant="int8")
    ds = synthetic_dataset(n_videos=4, k=cfg.n_frames, d=cfg.ctx_dim,
                           maxlen=8, seed=0)
    dev = ds.bank.to_device()
    batch = gather_batch(dev, ds.captions, np.arange(4, dtype=np.int32))

    def loss(params):
        out = forward_train(params, cfg, batch,
                            rng=jax.random.PRNGKey(0), train=True,
                            ss_prob=0.5)
        return out.nll_per_example.sum()

    from stvd.model.decoder import init_params
    params = init_params(jax.random.PRNGKey(0), cfg)
    g = jax.grad(loss)(params)
    for name in ("U", "W", "Wc"):
        assert float(jnp.abs(g[name]).max()) > 0.0, name
