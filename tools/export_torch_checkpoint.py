"""Convert a snuffy-tpu MIL checkpoint (.msgpack) to the reference's .pth.

Usage:
  python tools/export_torch_checkpoint.py runs/camelyon16/run/50.msgpack out.pth

Reads the Runner's payload ({params, w, step} — train/runner.py:273-280),
exports the MILNet params to the reference snuffy.py state-dict layout
(embed/torch_export.py; strict-load verified by
tests/test_reference_parity.py:test_milnet_export_roundtrip_to_reference)
and writes the learnable loss-mix scalar as the reference's
single_weight_parameter side file. The result loads in the reference's
test/ROI paths (reference train.py:620-641, roi.py:297-315).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        raise SystemExit(__doc__)
    src, dst = argv
    from flax import serialization

    from snuffy_tpu.embed.torch_export import save_milnet_pth

    with open(src, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    w = payload.get("w")
    sd = save_milnet_pth(
        payload["params"], dst,
        single_weight_parameter=None if w is None else float(w),
    )
    print(f"{src} → {dst} ({len(sd)} tensors, "
          f"w={None if w is None else float(w):.4f})")


if __name__ == "__main__":
    main()
