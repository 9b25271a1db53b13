from .archetypes import cloth, rope, walker, truss_tetrahedron  # noqa: F401
