"""Speculative decoding: a cheap draft model proposes, the target verifies.

Beyond-reference serving capability that composes naturally with this
framework: the draft can be the SAME checkpoint at a lower bit-width (e.g.
int2/int3 RTN as drafter for the int4-GPTQ target), so no second model is
needed — quantization itself provides the draft/verify pair.

Greedy speculative decoding is exact: the emitted sequence equals the target
model's own greedy decode (tokens are accepted only while they match the
target's argmax given the verified prefix), so speed-up never costs accuracy.

Implementation notes (TPU): verification scores the k proposed tokens with ONE
target forward over [prefix + proposals] (bucketed lengths, causal logits);
the draft runs k cached decode steps. Acceptance logic is host-side (tiny).
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.model import Model


@partial(jax.jit, static_argnames=("cfg", "fused"))
def _greedy_next_all(params, cfg, ids, fused=True):
    """argmax next-token at every position: [1,S] -> [S] token ids."""
    logits = llama.forward(params, cfg, ids, fused=fused)
    return jnp.argmax(logits[0], axis=-1)


def _bucket(n, cap):
    b = 32
    while b < n:
        b *= 2
    return min(b, cap)


def speculative_generate(
    target: Model,
    draft: Model,
    prompt: np.ndarray,
    max_new_tokens: int = 32,
    k: int = 4,
    fused: bool = True,
    max_len: Optional[int] = None,
) -> Tuple[np.ndarray, dict]:
    """Greedy speculative decode; returns (tokens [1, S+new], stats).

    stats: {'target_calls', 'draft_calls', 'accept_rate'} — with a good draft
    the number of target forwards shrinks toward new_tokens/(k+1).
    """
    cfg = target.config
    max_len = max_len or cfg.max_seq_len
    seq = list(np.asarray(prompt).reshape(-1))
    n_prompt = len(seq)
    t_calls = d_calls = 0
    proposed_total = accepted_total = 0

    def greedy_all(model, ids_list):
        L = len(ids_list)
        B = _bucket(L, max_len)
        padded = np.zeros((1, B), np.int64)
        padded[0, :L] = ids_list
        return np.asarray(_greedy_next_all(model.params, model.config,
                                           jnp.asarray(padded), fused))[:L]

    while len(seq) - n_prompt < max_new_tokens:
        # draft proposes k tokens autoregressively (greedy)
        proposal: List[int] = []
        dseq = list(seq)
        for _ in range(k):
            nxt = int(greedy_all(draft, dseq)[len(dseq) - 1])
            d_calls += 1
            proposal.append(nxt)
            dseq.append(nxt)

        # one target forward verifies prefix + proposal
        ver = greedy_all(target, seq + proposal)
        t_calls += 1
        # target's own next tokens at positions len(seq)-1 ... len(seq)+k-1
        n_accept = 0
        for i, tok in enumerate(proposal):
            if int(ver[len(seq) - 1 + i]) == tok:
                n_accept += 1
            else:
                break
        accepted = proposal[:n_accept]
        # the target's correction (or next token when all accepted) is free
        bonus = int(ver[len(seq) - 1 + n_accept])
        seq.extend(accepted + [bonus])
        proposed_total += len(proposal)
        accepted_total += n_accept

    seq = seq[: n_prompt + max_new_tokens]
    stats = {
        "target_calls": t_calls,
        "draft_calls": d_calls,
        "accept_rate": accepted_total / max(proposed_total, 1),
    }
    return np.asarray(seq)[None, :], stats
