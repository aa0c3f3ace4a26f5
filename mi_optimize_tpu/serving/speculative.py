"""Speculative decoding: a cheap draft model proposes, the target verifies.

Beyond-reference serving capability that composes naturally with this
framework: the draft can be the SAME checkpoint at a lower bit-width (e.g.
int2/int3 RTN as drafter for the int4-GPTQ target), so no second model is
needed — quantization itself provides the draft/verify pair.

Greedy speculative decoding is exact: the emitted sequence equals the target
model's own greedy decode (tokens are accepted only while they match the
target's argmax given the verified prefix), so speed-up never costs accuracy.

Implementation (TPU, fully KV-cached — no prefix re-forwards):
- both models hold a static-shape KV cache, prefilled once on the prompt;
- the draft proposes k tokens with k cached decode steps (one on-device
  `decode_loop` dispatch);
- the target verifies with ONE `prefill_chunk` of the k+1 tokens
  [last_verified, p_0..p_{k-1}] at position offset `pos` — its logits give
  the target argmax at every proposal position;
- rejection rollback is free: cache rows past the accepted point are stale
  but positionally masked, and are overwritten by later writes.
All shapes are static (chunk = k+1, draft loop = k), so exactly three
programs compile per (model, k).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.model import Model
from .engine import decode_loop, decode_step, init_cache, prefill, prefill_chunk


def speculative_generate(
    target: Model,
    draft: Model,
    prompt: np.ndarray,
    max_new_tokens: int = 32,
    k: int = 4,
    fused: bool = True,
    max_len: Optional[int] = None,
    cache_dtype=jnp.float32,
) -> Tuple[np.ndarray, dict]:
    """Greedy speculative decode; returns (tokens [1, S+new], stats).

    stats: {'target_calls', 'draft_calls', 'accept_rate'} — with a good draft
    the number of target forwards shrinks toward new_tokens/(k+1).
    """
    cfg = target.config
    seq = list(np.asarray(prompt).reshape(-1))
    n_prompt = len(seq)
    total = max_len or (n_prompt + max_new_tokens + k + 2)
    t_calls = d_calls = 0
    proposed_total = accepted_total = 0

    ids = jnp.asarray(np.asarray(prompt).reshape(1, -1))
    tcache = init_cache(cfg, 1, total, cache_dtype)
    dcache = init_cache(draft.config, 1, total, cache_dtype)
    tlogits, tcache = prefill(target.params, cfg, ids, tcache, fused)
    _, dcache = prefill(draft.params, draft.config, ids, dcache, fused)

    last_tok = int(np.asarray(jnp.argmax(tlogits, -1))[0])
    pos = n_prompt  # number of verified-and-cached positions in both caches

    out = [last_tok]
    while len(out) < max_new_tokens:
        # draft proposes k tokens (cached, one on-device dispatch);
        # also ingests last_tok (+ p_0..p_{k-2}) into its cache at pos..pos+k-1
        props_arr, dcache = decode_loop(
            draft.params, draft.config, jnp.asarray([[last_tok]]), dcache,
            jnp.asarray(pos), k, fused)
        props = [int(t) for t in np.asarray(props_arr)[0]]
        d_calls += k

        # one cached target chunk scores all k+1 positions
        chunk = jnp.asarray([[last_tok] + props])
        vlogits, tcache = prefill_chunk(
            target.params, cfg, chunk, tcache, jnp.asarray(pos), fused)
        ver = [int(t) for t in np.asarray(jnp.argmax(vlogits, -1))[0]]
        t_calls += 1

        n_accept = 0
        while n_accept < k and ver[n_accept] == props[n_accept]:
            n_accept += 1
        bonus = ver[n_accept]  # target's correction / free next token

        if n_accept == k:
            # the draft never ingested p_{k-1}; append its KV row so the next
            # round's draft loop sees the full accepted prefix
            _, dcache = decode_step(draft.params, draft.config,
                                    jnp.asarray([[props[k - 1]]]), dcache,
                                    jnp.asarray(pos + k), fused)
            d_calls += 1

        out.extend(props[:n_accept] + [bonus])
        proposed_total += k
        accepted_total += n_accept
        pos += n_accept + 1
        last_tok = bonus

    seq = seq + out[:max_new_tokens]
    stats = {
        "target_calls": t_calls,
        "draft_calls": d_calls,
        "accept_rate": accepted_total / max(proposed_total, 1),
    }
    return np.asarray(seq)[None, :], stats
