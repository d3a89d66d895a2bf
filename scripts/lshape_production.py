"""L-shape experiment at full reference resolution 50, end-to-end on TPU
(VERDICT round-1 gap: the L-shape case had only been run at resolution 12).

Reference configuration (``OCP_dolfin.py`` with L_shape=True): 3 analytic
buoys, Armijo line search, LR=5, 50 resolution (~17k mixed dofs — dense-LU
territory, no scoped-VMEM flag needed). Writes the full artifact set,
including the buoy-movement frames with the analytic x_d desired-path
segments (OCP_dolfin.py:173-174,545), under results/lshape_res50/.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from ocean_jax.config import OCPConfig
    from ocean_jax.pipelines import ocp

    print(f"backend: {jax.default_backend()}", flush=True)
    cfg = OCPConfig(L_shape=True, L_shape_resolution=50,
                    ud_experiment="3_buoys",
                    num_steps=int(os.environ.get("LSHAPE_STEPS", "30")),
                    use_line_search=True, LR=5.0,
                    out_dir="results/lshape_res50/")
    t0 = time.time()
    res, prob = ocp.run(cfg, verbose=True)
    print(f"done in {time.time()-t0:.1f}s: {res.iterations_run} iterations,"
          f" J {res.j_array[0]:.4e} -> {res.j_array[-1]:.4e},"
          f" exit={res.exit_reason}", flush=True)
    assert res.j_array[-1] < res.j_array[0]


if __name__ == "__main__":
    main()
