"""Predictor CLI — mirrors the reference's ``rpn_predictor.py`` entry point.

    python rpn_predictor.py --backbone mobilenet_v2 [--weights trained/rpn_...]

Loads weights (orbax checkpoint dir or Keras .h5), runs the fused jitted
inference pipeline (forward -> decode -> top-k -> NMS, SURVEY.md §3.2) over
the test split, reports proposal recall@topn, and writes drawn proposals for
the first batch to PNG (the reference shows them interactively).

Implementation lives in :mod:`tpurpn.cli` (also installed as ``rpn-predictor``).
"""

from tpurpn.cli import predictor_main as main

if __name__ == "__main__":
    main()
