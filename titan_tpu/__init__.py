"""titan_tpu: a TPU-native mass-spring physics simulator for soft robotics
and RL, with the API surface and physics semantics of GitWyd/Titan
(the CUDA reference; see SURVEY.md) redesigned for JAX/XLA/Pallas.

Quick start (mirrors the reference README demo):

    import titan_tpu as titan
    sim = titan.Simulation()
    sim.createLattice(titan.Vec(0, 0, 10), titan.Vec(5, 5, 5), 5, 5, 5)
    sim.createPlane(titan.Vec(0, 0, 1), 0)
    sim.start()
    sim.pause(1.0)
    sim.getAll()
    sim.stop()
"""

from .vec import Vec, dot, cross  # noqa: F401
from .config import (  # noqa: F401
    SimConfig, Integrator, ScatterMode,
    PASSIVE_SOFT, PASSIVE_STIFF,
    ACTIVE_CONTRACT_THEN_EXPAND, ACTIVE_EXPAND_THEN_CONTRACT,
    ACTUATED_EXPAND, ACTUATED_CONTRACT,
    CONSTRAINT_PLANE, CONTACT_PLANE, BALL, DIRECTION,
)
from .entities import Mass, Spring  # noqa: F401
from .containers import Container, Cube, Lattice, Beam, RobotLink  # noqa: F401
from .runtime.simulation import Simulation  # noqa: F401
from .stl import parse_stl  # noqa: F401
from . import diff  # noqa: F401  (differentiable rollouts)
from . import models  # noqa: F401  (cloth/rope/walker/truss archetypes)
from . import parallel  # noqa: F401  (batched envs, sharded scenes)

__version__ = "0.1.0"
