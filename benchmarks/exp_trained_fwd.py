"""Why is the forward slower with trained weights? (round 3 probe)

bench.py's trained-checkpoint re-validation showed the FORWARD alone at
27.3 ms/batch128 with trained weights vs 17.8 ms with random init — on the
same executable. Hypothesis: load_keras_h5_weights returns host numpy
arrays; fold_batch_norm only moves the *folded* conv weights to the device
(through jnp math), while the BN-less head convs (rpn_conv is 10.6 MB)
stay numpy and are re-uploaded through the axon tunnel on every timed
call. This probe times the identical jitted forward with (a) random-init
device variables, (b) trained variables exactly as bench.py builds them,
(c) the same trained variables after jax.device_put.

    python benchmarks/exp_trained_fwd.py
"""

import sys

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache, time_scan_chained


def main():
    enable_compile_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.data import SyntheticVOC, preprocess_batch
    from tpurpn.inference import fast_mobilenet_forward
    from tpurpn.io_utils import load_keras_h5_weights
    from tpurpn.model import fold_batch_norm, get_model, init_model

    B = 128
    hp = get_hyper_params("mobilenet_v2")
    base = init_model(get_model(hp), jax.random.key(0))
    _, rand_vars = fold_batch_norm(hp, base)

    params, stats, _ = load_keras_h5_weights(
        "trained/rpn_mobilenet_v2_trained.h5", base["params"],
        base.get("batch_stats"),
    )
    _, trained_vars = fold_batch_norm(hp, {"params": params, "batch_stats": stats})

    flat, _ = jax.tree_util.tree_flatten_with_path(trained_vars)
    host_leaves = [
        "/".join(getattr(k, "key", str(k)) for k in path)
        for path, v in flat if isinstance(v, np.ndarray)
    ]
    host_bytes = sum(
        v.nbytes for _, v in flat if isinstance(v, np.ndarray)
    )
    emit("trained_vars_host_resident", float(host_bytes) / 1e6, "MB",
         leaves=host_leaves[:8], n_leaves=len(host_leaves))

    raw, _, _ = next(SyntheticVOC(seed=1, num_samples=B).batches(B))
    imgs, _ = preprocess_batch(
        jnp.asarray(raw), jnp.zeros((B, 1, 4)), hp.img_size, dtype=jnp.bfloat16
    )

    from benchmarks.common import perturb_variables as perturb

    def fwd(variables, images, c):
        # carry perturbs a bias so XLA cannot hoist the loop-invariant forward
        reg, cls = fast_mobilenet_forward(hp, perturb(variables, c), images)
        return reg.astype(jnp.float32).mean() * 1e-6

    for name, v in (
        ("rand_device", rand_vars),
        ("trained_as_bench_builds", trained_vars),
        ("trained_device_put", jax.device_put(trained_vars)),
    ):
        dt = time_scan_chained(fwd, v, imgs, iters=30)
        emit(f"fwd_{name}", dt * 1e3, "ms/batch128")


if __name__ == "__main__":
    main()
