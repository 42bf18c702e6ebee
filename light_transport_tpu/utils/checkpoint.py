"""Checkpoint / resume for long photon runs.

The reference has no checkpointing; its one related primitive is
progressive image accumulation across repeated render calls
(src/path_tracing_fix1.py:166).  Here the complete checkpoint of a photon
run is tiny and exact (SURVEY.md §5): the tally arrays + the RNG seed + the
superstep/batch counters.  Snapshots are plain ``.npz`` files (orbax is
overkill for a dict of small arrays and keeps us dependency-light), written
atomically (tmp file + ``os.replace``) so a crash mid-save never corrupts
the previous snapshot.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import numpy as np

from light_transport_tpu.core.config import PhotonRunConfig
from light_transport_tpu.core.hostio import host_get
from light_transport_tpu.tally.tallies import PhotonTallies


def _norm(path: str) -> str:
    """np.savez appends '.npz' to suffix-less paths; normalize up front so
    save, load, and the resume existence check all agree on one filename."""
    return path if path.endswith(".npz") else path + ".npz"


def save_tallies(path: str, tallies: PhotonTallies, seed: int,
                 batches_done: int) -> None:
    path = _norm(path)
    # one retried device->host fetch per field (the tunneled backend fails
    # transfers transiently — core/hostio), staged once and reused
    arrays = {
        f.name: host_get(getattr(tallies, f.name))
        for f in dataclasses.fields(tallies)
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, seed=np.asarray(seed),
                 batches_done=np.asarray(batches_done), **arrays)
    os.replace(tmp, path)  # atomic: a crash mid-save leaves the old file


def load_tallies(path: str) -> Tuple[PhotonTallies, int, int]:
    with np.load(_norm(path)) as z:
        import jax.numpy as jnp

        tallies = PhotonTallies(
            **{
                f.name: jnp.asarray(z[f.name])
                for f in dataclasses.fields(PhotonTallies)
            }
        )
        return tallies, int(z["seed"]), int(z["batches_done"])


def accumulate(a: PhotonTallies, b: PhotonTallies) -> PhotonTallies:
    """Merge two tally partials (progressive refinement across runs —
    the TPU-native form of fix1's ``image += 0.25*color`` accumulation).

    Uses the counter-aware ``PhotonTallies.merge``: the two-word exact
    counters (launched, steps) need their lo-word carry normalized on
    every merge — a plain elementwise add lets lo grow past 2^24 after
    ~256 accumulations and silently rounds the photon count."""
    return a.merge(b)


def simulate_resumable(
    medium,
    cfg: PhotonRunConfig,
    seed: int,
    checkpoint_path: str,
    n_batches: int = 10,
    lanes: int = 16384,
) -> PhotonTallies:
    """Run cfg.n_photons split into n_batches, checkpointing after each.

    Restarting with the same arguments resumes from the last finished batch
    (same per-batch fold-in keys => the completed batches are bit-identical
    to an uninterrupted run's).
    """
    from light_transport_tpu.transport.photon import simulate_photons

    per_batch = cfg.n_photons // n_batches
    extra = cfg.n_photons - per_batch * n_batches
    start = 0
    total: Optional[PhotonTallies] = None
    if os.path.exists(_norm(checkpoint_path)):
        total, saved_seed, start = load_tallies(checkpoint_path)
        if saved_seed != seed:
            total, start = None, 0

    for b in range(start, n_batches):
        n_b = per_batch + (extra if b == 0 else 0)
        batch_cfg = dataclasses.replace(cfg, n_photons=n_b)
        key = jax.random.fold_in(jax.random.key(seed), b)
        part = simulate_photons(medium, batch_cfg, key, lanes=lanes)
        total = part if total is None else accumulate(total, part)
        save_tallies(checkpoint_path, total, seed, b + 1)
    return total


# ---------------------------------------------------------------------------
# Pallas quota-engine checkpoints (VERDICT r3 item 4)
#
# The complete state of a quota run between chunks is: the 9 SoA photon
# state arrays, the tallies, the per-tile remaining quota, the next chunk
# index, and the base seed (per-block seeds are derived as
# seed + block*65537, so a resumed run replays the identical RNG streams).
# Snapshots reuse the same atomic-npz convention as save_tallies.
# ---------------------------------------------------------------------------

_STATE_KEYS = ["px", "py", "pz", "dx", "dy", "dz", "w", "tau", "layer"]


def save_pallas_checkpoint(path: str, state, tallies: PhotonTallies,
                           quota, next_chunk: int, seed: int,
                           fingerprint: str) -> None:
    """Atomically snapshot a quota-engine run after a finished chunk."""
    path = _norm(path)
    arrays = {"state_" + k: host_get(v)
              for k, v in zip(_STATE_KEYS, state)}
    arrays.update({
        "tally_" + f.name: host_get(getattr(tallies, f.name))
        for f in dataclasses.fields(tallies)
    })
    arrays["quota"] = host_get(quota)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, seed=np.asarray(seed),
                 next_chunk=np.asarray(next_chunk),
                 fingerprint=np.asarray(fingerprint), **arrays)
    os.replace(tmp, path)


def load_pallas_checkpoint(path: str, fingerprint: str):
    """Load a quota-engine snapshot; returns None when the file is absent
    or was written by an incompatible run (different seed/config/shape —
    the fingerprint string encodes everything that must match for the
    replayed RNG streams and shapes to line up)."""
    path = _norm(path)
    if not os.path.exists(path):
        return None
    import jax.numpy as jnp

    with np.load(path) as z:
        if str(z["fingerprint"]) != fingerprint:
            return None
        state = tuple(jnp.asarray(z["state_" + k]) for k in _STATE_KEYS)
        tallies = PhotonTallies(
            **{f.name: jnp.asarray(z["tally_" + f.name])
               for f in dataclasses.fields(PhotonTallies)})
        return state, tallies, jnp.asarray(z["quota"]), int(z["next_chunk"])
