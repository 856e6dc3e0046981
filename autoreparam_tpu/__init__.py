"""autoreparam_tpu — TPU-native automatic reparameterisation of
probabilistic programs.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`mgorinova/autoreparam` (Gorinova, Moore & Hoffman, "Automatic
Reparameterisation of Probabilistic Programs", ICML 2020): write a
hierarchical model once, mechanically rewrite it into centered (CP),
non-centered (NCP), or variationally-inferred-parameterisation (VIP,
learnable per-variable λ) form, and run HMC/NUTS/VI/interleaved-HMC on it
with thousands of vmapped chains per chip, sharded over a TPU mesh.

See SURVEY.md for the structural map of the reference and BASELINE.md for
the parity targets.
"""

__version__ = "0.1.0"

from . import core, dists
from .core import sample, deterministic
