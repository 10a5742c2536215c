"""Pack a dataset into the native record format for production training IO.

Usage:
    python -m human_3d_reconstruction_tpu.cli.pack_records \
        <dataset_name> <index_or_src> <out.rec> [limit]

    dataset_name: lsp | lsp_ext | mpii | coco | h36m | mpi_inf_3dhp |
                  synthetic (no src needed; pass '-')

Then train with --data.sources='[["packed", "out.rec", 1.0]]'.
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> None:
    from human_3d_reconstruction_tpu.data.datasets import make_dataset
    from human_3d_reconstruction_tpu.data.recordio import pack_dataset

    if len(argv) < 3:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    name, src, out = argv[0], argv[1], argv[2]
    limit = int(argv[3]) if len(argv) > 3 else None

    if name == "synthetic":
        from human_3d_reconstruction_tpu.data.datasets import SyntheticImageDataset
        from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model

        ds = SyntheticImageDataset(synthetic_smpl_model(0), n=limit or 64)
    else:
        ds = make_dataset(name, src)
    n = pack_dataset(ds, out, limit=limit)
    print(f"packed {n} records into {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
