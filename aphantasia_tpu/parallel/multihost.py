"""Multi-host (DCN) fleet support.

The reference has no distributed code at all (SURVEY.md §2.6 — hardcoded
single `.cuda()` device, e.g. reference aphantasia/image.py:112). The
TPU-native scaling design is two-tier:

  * intra-host: multi-chip SPMD over ICI via `jax.sharding.Mesh`
    (parallel/mesh.py, parallel/spatial.py) — collectives in the hot loop;
  * inter-host: DCN is used ONLY for fleet rendering of *independent* work
    units — one scene per host in illustra mode (scenes are independent
    text lines, reference illustra.py:267-308) and one snapshot pair per
    host in interpol mode (reference aphantasia/interpol.py:48-60). No
    cross-host communication in the hot loop, by design (SURVEY.md §2.6
    "Multi-host" row).

`init_fleet` wires the JAX multi-process runtime (coordination service) so
that on a real TPU pod each process sees its local chips while
`jax.process_index/count` give the fleet coordinates; on CPU the same code
path runs with N processes for testing. A coordinator-less mode (pure
rank/world bookkeeping, no JAX distributed runtime) covers fleets of
isolated single-host jobs that only share a filesystem.
"""
from __future__ import annotations

import os
import re
from typing import List, Optional, Tuple

_FLEET: Optional[Tuple[int, int]] = None  # (rank, world) after init_fleet


def parse_fleet(spec: str) -> Tuple[int, int, Optional[str]]:
    """'R/N' or 'R/N@host:port' -> (rank, world, coordinator|None)."""
    m = re.fullmatch(r"(\d+)/(\d+)(?:@(.+))?", spec.strip())
    if not m:
        raise ValueError(
            "fleet spec must be 'RANK/WORLD' or 'RANK/WORLD@HOST:PORT', "
            f"got {spec!r}")
    rank, world = int(m.group(1)), int(m.group(2))
    if world < 1 or not (0 <= rank < world):
        raise ValueError(f"invalid fleet coordinates {rank}/{world}")
    return rank, world, m.group(3)


def init_fleet(spec: Optional[str] = None) -> Tuple[int, int]:
    """Initialize fleet coordinates (idempotent). Resolution order:

    1. explicit `spec` / APHANTASIA_FLEET env ('R/N[@coordinator:port]') —
       with a coordinator, starts the JAX multi-process runtime
       (jax.distributed.initialize), giving a true multi-host TPU job;
       without one, records rank/world for scene sharding only;
    2. an already-initialized JAX multi-process runtime (e.g. TPU pod
       auto-bootstrap) — adopts jax.process_index/process_count;
    3. single process (0/1).
    """
    global _FLEET
    if _FLEET is not None:
        return _FLEET
    spec = spec or os.environ.get("APHANTASIA_FLEET")
    if spec:
        rank, world, coordinator = parse_fleet(spec)
        if coordinator and world > 1:
            import jax
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=world, process_id=rank)
            rank, world = jax.process_index(), jax.process_count()
        else:
            # a coordinator-less 'R/N' must not silently desync scene
            # sharding from an already-running JAX multi-process runtime
            # (e.g. TPU pod auto-bootstrap) — prefer the real topology
            try:
                import jax
                pr, pw = jax.process_index(), jax.process_count()
            except Exception:
                pr, pw = 0, 1
            if pw > 1 and (pr, pw) != (rank, world):
                print(f" fleet: spec {rank}/{world} disagrees with the "
                      f"initialized JAX runtime {pr}/{pw}; using the runtime")
                rank, world = pr, pw
        _FLEET = (rank, world)
        return _FLEET
    try:
        import jax
        if jax.process_count() > 1:
            _FLEET = (jax.process_index(), jax.process_count())
            return _FLEET
    except Exception:
        pass
    _FLEET = (0, 1)
    return _FLEET


def fleet_info() -> Tuple[int, int]:
    """(rank, world); (0, 1) when init_fleet was never called."""
    return _FLEET if _FLEET is not None else (0, 1)


def is_primary() -> bool:
    return fleet_info()[0] == 0


def shard_scenes(count: int, rank: Optional[int] = None,
                 world: Optional[int] = None) -> List[int]:
    """Deterministic round-robin assignment of independent work units.

    Round-robin (not contiguous blocks) so every host gets early scenes —
    partial fleets still produce a watchable prefix of the piece."""
    if rank is None or world is None:
        rank, world = fleet_info()
    return list(range(rank, count, world))


def _reset_for_tests():
    global _FLEET
    _FLEET = None
