"""Standard effect handlers: seed, trace, substitute, condition, block.

TPU-native equivalents of the reference's Edward2 interceptors
(`ed.interception`, `ed.tape`, `ed.make_log_joint_fn`; SURVEY.md L1).  Each
handler is a trace-time rewrite; the functions they produce are pure JAX.
"""

from __future__ import annotations

import collections
import zlib
from typing import Callable, Dict, Optional

import jax

from .messenger import Messenger, SampleMessage

__all__ = ["seed", "trace", "substitute", "condition", "block"]


class seed(Messenger):
    """Thread a PRNG key through the model: each latent site gets a fresh
    subkey via `jax.random.fold_in` on the site name (stable under reordering
    of trace-time execution and cheap to trace)."""

    def __init__(self, fn: Optional[Callable] = None, key=None):
        super().__init__(fn)
        if key is None:
            raise ValueError("seed handler requires a PRNG key")
        self.key = key

    def process_message(self, msg: SampleMessage) -> None:
        if (msg.rng is None and msg.value is None
                and not msg.observed and not msg.is_deterministic):
            # Per-site key derived from a stable hash of the site name
            # (crc32, not Python's per-process-randomized hash):
            # deterministic given the handler key, independent across sites.
            msg.rng = jax.random.fold_in(
                self.key, zlib.crc32(msg.name.encode()) & 0x7FFFFFFF)


class trace(Messenger):
    """Record every site into an OrderedDict name -> SampleMessage."""

    def __init__(self, fn: Optional[Callable] = None):
        super().__init__(fn)
        self.sites: "collections.OrderedDict[str, SampleMessage]" = (
            collections.OrderedDict())

    def __enter__(self):
        self.sites = collections.OrderedDict()
        return super().__enter__()

    def postprocess_message(self, msg: SampleMessage) -> None:
        if msg.name in self.sites:
            raise ValueError(f"duplicate site name {msg.name!r} in model")
        self.sites[msg.name] = msg

    def get_trace(self, *args, **kwargs):
        if self.fn is None:
            raise TypeError("trace must wrap a function to use get_trace")
        self(*args, **kwargs)
        return self.sites


class substitute(Messenger):
    """Fix the values of named latent sites (they stay latent — their
    log_prob still contributes to the joint)."""

    def __init__(self, fn: Optional[Callable] = None,
                 data: Optional[Dict] = None):
        super().__init__(fn)
        self.data = data or {}

    def process_message(self, msg: SampleMessage) -> None:
        if msg.is_deterministic or msg.observed:
            return
        if msg.value is None and msg.name in self.data:
            msg.value = self.data[msg.name]


class condition(Messenger):
    """Mark named sites as observed with the given values."""

    def __init__(self, fn: Optional[Callable] = None,
                 data: Optional[Dict] = None):
        super().__init__(fn)
        self.data = data or {}

    def process_message(self, msg: SampleMessage) -> None:
        if msg.is_deterministic:
            return
        if msg.name in self.data:
            msg.value = self.data[msg.name]
            msg.observed = True


class block(Messenger):
    """Hide matching sites from outer handlers (stop propagation)."""

    def __init__(self, fn: Optional[Callable] = None,
                 hide_fn: Optional[Callable[[SampleMessage], bool]] = None):
        super().__init__(fn)
        self.hide_fn = hide_fn or (lambda msg: True)

    def process_message(self, msg: SampleMessage) -> None:
        if self.hide_fn(msg):
            msg.stop = True
