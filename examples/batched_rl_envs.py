"""Batched multi-agent RL configuration (BASELINE.json config 5): 1024
vmapped independent robots with per-env parameter sweeps, sharded across
every available chip (data parallel)."""

import jax
import jax.numpy as jnp
import numpy as np

import titan_tpu as titan
from titan_tpu.parallel import BatchedScenes, make_mesh


def main(n_envs=1024, steps=2000):
    sim = titan.Simulation()
    sim.createLattice(titan.Vec(0, 0, 0.6), titan.Vec(1, 1, 1), 3, 3, 3)
    sim.createPlane(titan.Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setGlobalAcceleration(titan.Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)

    mesh = make_mesh(("dp",))
    envs = BatchedScenes.from_simulation(sim, n_envs=n_envs, mesh=mesh)

    # per-env parameter sweep: spring stiffness varies across envs
    key = jax.random.PRNGKey(0)
    k_scale = jax.random.uniform(key, (n_envs, 1, 1), minval=0.5, maxval=2.0)
    import dataclasses
    envs.state = dataclasses.replace(
        envs.state,
        stencil=dataclasses.replace(
            envs.state.stencil,
            k=envs.state.stencil.k * k_scale.astype(envs.state.stencil.k.dtype)))

    import time
    t0 = time.perf_counter()
    envs.run(steps)
    z = np.asarray(jax.device_get(envs.positions()))[:, 2, :]
    wall = time.perf_counter() - t0
    print(f"{n_envs} envs x {steps} steps in {wall:.2f}s "
          f"({n_envs * steps / wall:,.0f} env-steps/s) on "
          f"{len(mesh.devices.flat)} device(s)")
    print("mean final height per env quartile:",
          np.round(np.quantile(z.mean(axis=1), [0, 0.25, 0.5, 0.75, 1]), 3))


if __name__ == "__main__":
    main()
