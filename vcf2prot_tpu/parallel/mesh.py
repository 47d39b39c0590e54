"""Device-mesh helpers.

The reference's only multi-node story is a Python process pool sharding
samples across separate binary invocations (reference:
automation_scripts/parallization_python.py:196-207). Here the same sample-axis
sharding is an in-program device mesh: one ``dp`` axis over all chips, with
the reference-proteome blob replicated and cohort chunks sharded.
"""
from __future__ import annotations

import numpy as np


def make_mesh(n_devices: int = 0):
    """A 1-D ``dp`` mesh over this host's LOCAL devices (first ``n_devices``
    of them when given).

    Multi-host runs shard the *sample* axis across hosts (contiguous
    balanced blocks, parallel/multihost.py) and each host executes its shard on its own local
    mesh -- a global mesh would require distributed arrays for data every
    host only holds locally.
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.local_devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("dp",))
