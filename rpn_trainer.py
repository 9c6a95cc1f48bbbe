"""Trainer CLI — mirrors the reference's ``rpn_trainer.py`` entry point.

    python rpn_trainer.py --backbone vgg16 [--dataset synthetic|/path/to/VOC2007]

Differences from the reference (SURVEY.md §2 row 1), all TPU-native:
* the whole step (preprocess -> targets -> fwd/bwd -> update) is ONE jitted
  program on device — no host-side generator;
* --data-parallel shards the batch over every visible device
  (jax.sharding 'data' mesh; XLA all-reduces gradients over ICI);
* checkpoints are orbax full-train-state saves (best validation loss).

Implementation lives in :mod:`tpurpn.cli` (also installed as ``rpn-trainer``).
"""

from tpurpn.cli import trainer_main as main

if __name__ == "__main__":
    main()
