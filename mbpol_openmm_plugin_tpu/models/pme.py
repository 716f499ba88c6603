"""PME electrostatics (periodic path). Implemented in a later milestone."""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PmeSetup:
    alpha: float
    grid: tuple
    cutoff: float

    @classmethod
    def from_config(cls, system, config):
        raise NotImplementedError('PME lands in the next milestone')


def pme_electrostatics(params, setup, positions):
    raise NotImplementedError('PME lands in the next milestone')
