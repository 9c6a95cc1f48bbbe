"""BASELINE config 5: COCO-scale RPN training, data-parallel mesh,
on-device preprocessing. BASELINE.json:11.

    python benchmarks/config5_coco_scale_dp.py [--devices N] [--virtual]

COCO-scale = 640x640 inputs (40x40 stride-16 feature map, 14400 anchors),
larger GT count (max 64). The batch is sharded over all visible devices
('data' mesh axis); XLA all-reduces gradients over ICI. --virtual runs the
same program on 8 virtual CPU devices (sharding validation without a pod).
"""

import sys
import time

sys.path.insert(0, ".")

from benchmarks.common import emit, enable_compile_cache


def main():
    if "--virtual" in sys.argv:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tpurpn import get_hyper_params
    from tpurpn.data import SyntheticVOC
    from tpurpn.model import get_model
    from tpurpn.train import (
        create_train_state,
        make_data_mesh,
        make_train_step,
        replicate,
        shard_batch,
    )

    n_devices = jax.device_count()
    if "--devices" in sys.argv:
        n_devices = int(sys.argv[sys.argv.index("--devices") + 1])
    per_device_batch = 4 if "--virtual" in sys.argv else 16
    if "--per-device-batch" in sys.argv:
        per_device_batch = int(sys.argv[sys.argv.index("--per-device-batch") + 1])
    BATCH = per_device_batch * n_devices

    hp = get_hyper_params("mobilenet_v2", img_size=640)
    model = get_model(hp)
    mesh = make_data_mesh(n_devices)
    state = replicate(mesh, create_train_state(hp, jax.random.key(0), model=model))
    step = make_train_step(hp, model=model, mesh=mesh, augment=True)

    ds = SyntheticVOC(num_samples=BATCH, raw_h=480, raw_w=640, max_boxes=hp.max_gt_boxes)
    imgs, boxes, labels = next(ds.batches(BATCH))
    sh = shard_batch(mesh, jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels))
    key = jax.random.key(1)

    state, m = step(state, *sh, key)
    float(m["loss"])  # compile + warm the single-step program
    # chain steps by the train-state carry across dispatches: the next step
    # can't start before the previous one's state lands, so the measured time
    # is honest step time; one final scalar pull syncs (the ~25 ms/dispatch
    # axon-tunnel overhead would otherwise dominate a per-step sync at this
    # batch — benchmarks/common.py docstring)
    iters = 10
    # min-of-3 reps (CLAUDE.md ~5% spread); the state carries FORWARD through
    # all reps — the step donates its input state, so restarting a rep from
    # a saved state would re-submit donated buffers
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, *sh, key)
        float(m["loss"])
        dt = min(dt, (time.perf_counter() - t0) / iters)
    emit(
        "config5_coco_scale_dp_train",
        BATCH / dt,
        "images/sec",
        devices=n_devices,
        per_device_batch=per_device_batch,
        images_per_sec_per_chip=round(BATCH / dt / n_devices, 2),
    )

    # Round 5: the device-resident scanned variant — the dataset shards over
    # the mesh ONCE (N/D rows per device HBM), each device walks its own
    # shard, and `iters` steps chain inside one lax.scan dispatch
    # (train.make_scan_train_steps(mesh=...); parity with the sharded host
    # loop pinned in tests/test_train.py). vs the row above, this also
    # removes the per-step dispatch itself, not just the host feed.
    from tpurpn.train import make_scan_train_steps

    N = BATCH * 8
    ds2 = SyntheticVOC(num_samples=N, raw_h=480, raw_w=640,
                       max_boxes=hp.max_gt_boxes)
    imgs2, boxes2, labels2 = next(ds2.batches(N))
    sh_ds = shard_batch(mesh, jnp.asarray(imgs2), jnp.asarray(boxes2),
                        jnp.asarray(labels2))
    state2 = replicate(
        mesh, create_train_state(hp, jax.random.key(0), model=model)
    )
    run = make_scan_train_steps(hp, model=model, augment=True,
                                batch_size=BATCH, num_steps=iters, mesh=mesh)
    key2 = jax.random.key(1)
    state2, key2, mm = run(state2, key2, *sh_ds)  # compile + warm
    float(mm["loss"][-1])
    dt2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state2, key2, mm = run(state2, key2, *sh_ds)
        float(mm["loss"][-1])
        dt2 = min(dt2, (time.perf_counter() - t0) / iters)
    emit(
        "config5_coco_scale_dp_train_scanned",
        BATCH / dt2,
        "images/sec",
        devices=n_devices,
        per_device_batch=per_device_batch,
        resident_images=N,
        images_per_sec_per_chip=round(BATCH / dt2 / n_devices, 2),
    )


if __name__ == "__main__":
    main()
