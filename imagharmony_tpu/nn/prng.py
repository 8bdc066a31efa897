"""Host-side parameter-init RNG.

Param init is host work: doing it with jax.random costs one tiny XLA
compile per distinct shape (~50 s for the full bundle on CPU, worse over a
remote-TPU tunnel). This numpy SeedSequence tree gives the same
reproducibility (keyed, splittable) with zero compiles; the training/
sampling paths keep real jax.random.

Every ``*_init`` accepts a jax PRNG key, an int seed, or a Key; ``ensure``
normalizes.
"""

from __future__ import annotations

import numpy as np


class Key:
    __slots__ = ("_seq", "_rng", "abstract")

    def __init__(self, seq, *, abstract=False):
        if isinstance(seq, int):
            seq = np.random.SeedSequence(seq)
        self._seq = seq
        self._rng = None
        self.abstract = abstract

    @property
    def rng(self) -> np.random.Generator:
        if self._rng is None:
            self._rng = np.random.default_rng(self._seq)
        return self._rng

    def split(self, n: int):
        return [Key(s, abstract=self.abstract) for s in self._seq.spawn(n)]

    # -- samplers (return numpy; jnp.asarray happens lazily on first use) --

    def normal(self, shape, dtype=np.float32, *, stddev=1.0):
        if self.abstract:
            return np.broadcast_to(np.zeros((), dtype), shape)
        # sample in float32 natively — float64 doubles memory traffic and
        # costs minutes at SDXL scale (2.6B params)
        x = self.rng.standard_normal(shape, dtype=np.float32) * np.float32(stddev)
        return x if np.dtype(dtype) == np.float32 else x.astype(dtype)

    def uniform(self, shape, dtype=np.float32, *, minval=0.0, maxval=1.0):
        if self.abstract:
            return np.broadcast_to(np.zeros((), dtype), shape)
        x = self.rng.random(shape, dtype=np.float32)
        x = x * np.float32(maxval - minval) + np.float32(minval)
        return x if np.dtype(dtype) == np.float32 else x.astype(dtype)


def ensure(key) -> Key:
    if isinstance(key, Key):
        return key
    if isinstance(key, (int, np.integer)):
        return Key(int(key))
    # jax PRNG key (typed or raw uint32): one host transfer, no compile
    import jax

    try:
        data = jax.random.key_data(key)
    except Exception:
        data = key
    arr = np.asarray(data).ravel()
    return Key(np.random.SeedSequence([int(x) for x in arr.tolist()]))


def split(key, n: int):
    return ensure(key).split(n)


def abstract_key() -> Key:
    """Shape-only Key: samplers return zero-byte broadcast views. Use to
    build checkpoint-import templates without allocating a random init."""
    return Key(0, abstract=True)
