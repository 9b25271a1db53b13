from .archetypes import (cloth, quadruped, rope, tensegrity,  # noqa: F401
                         truss_tetrahedron, walker)
