"""Beam search on the paged megakernel path (round 3, last serving-
composition leftover).

The paged step is bit-identical to the dense batched step
(test_paged_mega.py), so a dense-cache beam search with the same selection
semantics (gather slot slabs on reorder instead of page-table copy-on-write)
must produce exactly the same hypotheses — this pins the table surgery
(shared pages, per-child tail copy, lazy growth, slot recycling).
"""
import jax.numpy as jnp
import numpy as np

from mi_optimize_tpu.serving import init_cache, prefill
from mi_optimize_tpu.serving.beam import _log_softmax, _norm, beam_search
from mi_optimize_tpu.serving.megadecode import (
    model_step_batch, stack_cache_batched, stack_serving)
from mi_optimize_tpu.serving.paged import PagedMegaBatcher
from tests.test_model_fused_batch import _mega_model


def _dense_beam(model, prompt, W, max_new, lp=1.0, eos=None, max_len=256):
    """Reference: same scoring/selection, dense B=W cache, reorder by
    gathering parent slot slabs."""
    cfg = model.config
    stack, meta = stack_serving(model)
    prompt = np.asarray(prompt).reshape(-1)
    S = len(prompt)

    one = init_cache(cfg, 1, max_len, jnp.int8)
    logits0, one = prefill(model.params, cfg, jnp.asarray(prompt[None, :]),
                           one, False)
    cache = stack_cache_batched(one)
    cache = {f: jnp.repeat(cache[f], W, axis=1) for f in cache}

    logp0 = _log_softmax(np.asarray(logits0[0]))
    first = np.argsort(-logp0, kind="stable")[:W]
    beams = [[int(t)] for t in first]
    scores = np.array([logp0[t] for t in first])
    last = np.array([int(t) for t in first])
    positions = np.full(W, S, np.int64)
    alive = [eos is None or beams[w][-1] != eos for w in range(W)]
    finished = []
    for w in range(W):
        if not alive[w]:
            finished.append((beams[w], _norm(scores[w], 1, lp)))

    while any(alive) and len(beams[0]) < max_new:
        live = [w for w in range(W) if alive[w]]
        logits, cache = model_step_batch(
            model.params, stack, meta, cfg, jnp.asarray(last[:, None]),
            cache, jnp.asarray(positions), interpret=True)
        logp = _log_softmax(np.asarray(logits))
        V = logp.shape[1]
        cand = np.full((W, V), -np.inf)
        cand[live] = scores[live, None] + logp[live]
        order = np.argsort(-cand.reshape(-1), kind="stable")[:2 * W]
        nlen = len(beams[live[0]]) + 1
        new_parent, new_tok, new_score = [], [], []
        for idx in order:
            p_, t_ = int(idx // V), int(idx % V)
            if eos is not None and t_ == eos:
                if len(finished) < 2 * W:
                    finished.append((beams[p_] + [t_],
                                     _norm(cand[p_, t_], nlen, lp)))
                continue
            new_parent.append(p_)
            new_tok.append(t_)
            new_score.append(cand[p_, t_])
            if len(new_parent) == len(live):
                break
        gather = new_parent + [0] * (W - len(new_parent))
        cache = {f: cache[f][:, np.asarray(gather)] for f in cache}
        nb, ns = [], np.full(W, -np.inf)
        nl, npos = np.zeros(W, np.int64), np.zeros(W, np.int64)
        old_pos = positions.copy()
        for i, (p_, t_, s_) in enumerate(zip(new_parent, new_tok, new_score)):
            nb.append(beams[p_] + [t_])
            ns[i] = s_
            nl[i] = t_
            npos[i] = old_pos[p_] + 1
        beams = nb + [[]] * (W - len(nb))
        scores, last, positions = ns, nl, npos
        alive = [i < len(new_parent) for i in range(W)]
        if npos.max() >= max_len - 1:
            break

    for w in range(W):
        if alive[w]:
            finished.append((beams[w], _norm(scores[w], len(beams[w]), lp)))
    finished.sort(key=lambda x: -x[1])
    return finished[:W]


def test_beam_matches_dense_reference():
    model = _mega_model(seed=22)
    rng = np.random.default_rng(47)
    prompt = rng.integers(0, 128, (150,))   # shared full page + mid-page tail
    W, new = 3, 7

    ref = _dense_beam(model, prompt, W, new)
    got = beam_search(model, prompt, beam_width=W, max_new_tokens=new,
                      max_len=256)
    assert len(got) == len(ref)
    for (gt, gs), (rt, rs) in zip(got, ref):
        assert gt == rt, (gt, rt)
        # scores ride the device f32 log-softmax since the r4 compact
        # top-k pull; tokens must still match exactly (asserted above)
        np.testing.assert_allclose(gs, rs, rtol=1e-5)


def test_beam_with_eos_absorption():
    """Force an eos mid-search: hypotheses ending in eos leave the beam set
    and still rank by normalized score; results match the dense reference."""
    model = _mega_model(seed=22)
    rng = np.random.default_rng(53)
    prompt = rng.integers(0, 128, (40,))
    W, new = 3, 6
    # pick the greedy 3rd token as eos so at least one branch absorbs
    probe = beam_search(model, prompt, beam_width=1, max_new_tokens=4,
                        max_len=256)
    eos = probe[0][0][2]

    ref = _dense_beam(model, prompt, W, new, eos=eos)
    got = beam_search(model, prompt, beam_width=W, max_new_tokens=new,
                      eos_token_id=eos, max_len=256)
    for (gt, gs), (rt, rs) in zip(got, ref):
        assert gt == rt, (gt, rt)
        # scores ride the device f32 log-softmax since the r4 compact
        # top-k pull; tokens must still match exactly (asserted above)
        np.testing.assert_allclose(gs, rs, rtol=1e-5)


def test_beam_width1_equals_greedy():
    """W=1 beam search degenerates to greedy decode == PagedMegaBatcher."""
    model = _mega_model(seed=22)
    rng = np.random.default_rng(59)
    prompt = rng.integers(0, 128, (60,))
    new = 6
    ref = list(PagedMegaBatcher(model, n_slots=1, max_len=256, page_size=128,
                                n_pages=4).run_all([prompt], max_new_tokens=new)
               .values())[0]
    got = beam_search(model, prompt, beam_width=1, max_new_tokens=new,
                      max_len=256)
    assert got[0][0] == ref
