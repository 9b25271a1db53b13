from .archetypes import (cloth, quadruped, rope, truss_tetrahedron,  # noqa: F401
                         walker)
