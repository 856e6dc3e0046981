"""Effect-handler core: the `sample` primitive and the handler stack.

This is the TPU-native replacement for the reference's Edward2 interceptor
layer (reference: `ed.interception` context managers over `ed.RandomVariable`
construction; see SURVEY.md L1).  Instead of rewriting a TF graph, handlers
here run at *trace time* (plain Python, executed once per `jax.jit` trace)
and therefore always emit pure JAX functions — there is no graph, no
session, and nothing handler-related survives into the compiled program.

Design follows the NumPyro effect-handler idiom (Phan et al.,
arXiv:1912.11554) but is minimal and owned: a global handler stack, a
message dict per `sample` statement, `process_message` applied innermost
first, `postprocess_message` outermost last.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

__all__ = [
    "Messenger",
    "SampleMessage",
    "sample",
    "deterministic",
    "apply_stack",
]

# The global handler stack. Only mutated at Python trace time, never inside
# compiled code, so it is safe under jit/vmap/shard_map retracing.
_STACK: list["Messenger"] = []


@dataclasses.dataclass
class SampleMessage:
    """One `sample`/`deterministic` statement flowing through the stack."""

    name: str
    dist: Any  # a dists.Distribution, or None for deterministic sites
    value: Any = None
    observed: bool = False
    is_deterministic: bool = False
    rng: Any = None
    sample_shape: Tuple[int, ...] = ()
    # Set True by a handler to stop propagation to outer handlers.
    stop: bool = False
    # Free-form slot for handlers (e.g. reparam strategies tag aux sites
    # with {"aux_of": original_name} so outer reparam handlers skip them).
    metadata: dict = dataclasses.field(default_factory=dict)


class Messenger:
    """Base handler. Subclasses override process/postprocess_message.

    A Messenger can optionally wrap a callable `fn`; calling the Messenger
    runs `fn` with the handler installed:  `seed(model, key)(*args)`.
    """

    def __init__(self, fn: Optional[Callable] = None):
        self.fn = fn

    def __enter__(self):
        _STACK.append(self)
        return self

    def __exit__(self, exc_type, exc_value, tb):
        assert _STACK[-1] is self, "handler stack corrupted"
        _STACK.pop()

    def process_message(self, msg: SampleMessage) -> None:
        pass

    def postprocess_message(self, msg: SampleMessage) -> None:
        pass

    def __call__(self, *args, **kwargs):
        if self.fn is None:
            raise TypeError(
                f"{type(self).__name__} does not wrap a function; use it as a "
                "context manager instead"
            )
        with self:
            return self.fn(*args, **kwargs)


def apply_stack(msg: SampleMessage) -> SampleMessage:
    """Run `msg` through the handler stack (innermost handler first)."""
    stack = _STACK
    # Innermost (most recently entered) handlers see the message first.
    pointer = 0
    for pointer, handler in enumerate(reversed(stack)):
        handler.process_message(msg)
        if msg.stop:
            break

    if msg.value is None and not msg.is_deterministic:
        if msg.rng is None:
            raise RuntimeError(
                f"site {msg.name!r} needs a PRNG key: wrap the model in "
                "handlers.seed(model, key), or substitute a value for it"
            )
        msg.value = msg.dist.sample(msg.rng, msg.sample_shape)

    # Postprocess outermost-last, starting from the handler that stopped
    # propagation (or the outermost if none did).
    for handler in stack[len(stack) - pointer - 1 :]:
        handler.postprocess_message(msg)
    return msg


def sample(name: str, dist, *, obs=None, sample_shape: Tuple[int, ...] = (),
           _metadata: Optional[dict] = None):
    """Introduce a random variable named `name` with distribution `dist`.

    With `obs=...` the site is observed (conditioned on data).  Returns the
    site's value (sampled, substituted, or observed).  Must run under at
    least one handler; bare calls outside any handler are an error — the
    reference's equivalent was constructing an `ed.RandomVariable`, which
    likewise only became meaningful under interceptors / `make_log_joint_fn`.
    """
    if not _STACK:
        raise RuntimeError(
            f"sample({name!r}) called outside of any handler; wrap the model "
            "in handlers.seed/trace/substitute"
        )
    msg = SampleMessage(
        name=name,
        dist=dist,
        value=obs,
        observed=obs is not None,
        sample_shape=tuple(sample_shape),
        metadata=dict(_metadata) if _metadata else {},
    )
    apply_stack(msg)
    return msg.value


def deterministic(name: str, value):
    """Record a named deterministic quantity in the trace.

    Used by reparameterisation strategies to expose the model-space value
    `z` after the latent has been replaced by an auxiliary variable (the
    reference exposed this via Edward2's tape of deterministic transforms).
    """
    if not _STACK:
        return value
    msg = SampleMessage(name=name, dist=None, value=value,
                        is_deterministic=True)
    apply_stack(msg)
    return msg.value
