"""Explicitly promote a step-stamped trained checkpoint to a canonical path.

Round-4 lesson (VERDICT r4 weak #1): benchmark phase scripts exporting
repeated training chunks to ONE shared .h5 path silently desynchronized the
committed artifact from the one the driver benched. recall_demo.py therefore
exports only to step-stamped paths with a provenance sidecar; making a
checkpoint canonical (e.g. trained/rpn_mobilenet_v2_trained.h5, the file
bench.py's trained row loads) is this explicit, logged step — it copies BOTH
the .h5 and its sidecar, so the canonical artifact always carries its
{steps, recall@300, final loss, recipe, date} metadata beside it.

    python benchmarks/promote_checkpoint.py trained/foo_step8000.h5 trained/rpn_mobilenet_v2_trained.h5
"""

import json
import os
import shutil
import sys


def main(stamped_h5, canonical_h5):
    root, _ = os.path.splitext(stamped_h5)
    sidecar = f"{root}.json"
    if not os.path.exists(sidecar):
        sys.exit(f"refusing to promote {stamped_h5}: no sidecar {sidecar} "
                 f"(provenance metadata is required for canonical artifacts)")
    with open(sidecar) as f:
        meta = json.load(f)
    croot, _ = os.path.splitext(canonical_h5)
    shutil.copyfile(stamped_h5, canonical_h5)
    shutil.copyfile(sidecar, f"{croot}.json")
    print(f"promoted {stamped_h5} -> {canonical_h5} "
          f"(steps={meta['steps']}, recall300={meta['recall300']}, "
          f"loss={meta['final_loss']}, date={meta['date']})")


if __name__ == "__main__":
    main(*sys.argv[1:3])
