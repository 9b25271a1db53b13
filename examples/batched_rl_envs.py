"""Batched multi-agent RL configuration (BASELINE.json config 5): 1024
independent robots with per-env parameter sweeps.

Uses the flat-packed formulation (titan_tpu.parallel.replicate_scene): the
batch becomes one stencil scene and runs through the fused Pallas kernel --
~23M env-steps/s steady-state through the full control plane on one TPU
v5e chip, ~35M driving the chunk directly (the vmap formulation in
parallel/batched.py is ~1000x slower on TPU; see its docstring)."""

import time

import numpy as np

import titan_tpu as titan
from titan_tpu.parallel import replicate_scene


def main(n_envs=1024, steps=2000):
    src = titan.Simulation()
    src.createLattice(titan.Vec(0, 0, 0.6), titan.Vec(1, 1, 1), 3, 3, 3)
    src.createPlane(titan.Vec(0, 0, 1), 0, 0.4, 0.6)
    src.setGlobalAcceleration(titan.Vec(0, 0, -9.8))
    src.setTimeStep(0.0001)

    big, envs = replicate_scene(src, n_envs=n_envs,
                                spacing=titan.Vec(3, 0, 0))
    # per-env parameter sweep: spring stiffness varies across envs
    rng = np.random.default_rng(0)
    for env in envs:
        env.setSpringConstants(float(rng.uniform(5_000, 20_000)))

    big.start()
    # warm up (program load + first dispatch), then time a steady-state
    # span; sync with device_get -- on the tunneled TPU platform pause()
    # returns when the chunk is DISPATCHED, so wall time without a
    # readback sync measures queueing, not compute
    import jax
    big.pause(10 * big.getTimeStep())
    float(jax.device_get(big._state.t))
    big.resume()
    t0 = time.perf_counter()
    big.pause((10 + steps) * big.getTimeStep())
    float(jax.device_get(big._state.t))
    wall = time.perf_counter() - t0
    big.getAll()
    st = big._store
    heights = np.array([st.pos[e._mass_idx, 2].mean() for e in envs])
    big.stop()
    print(f"{n_envs} envs x {steps} steps in {wall:.2f}s "
          f"({n_envs * steps / wall:,.0f} env-steps/s)")
    print("mean final height per env quartile:",
          np.round(np.quantile(heights, [0, 0.25, 0.5, 0.75, 1]), 3))


if __name__ == "__main__":
    main(n_envs=64, steps=500) if __import__("jax").default_backend() == "cpu"         else main()
