"""`python -m human_3d_reconstruction_tpu` — entry-point directory."""

import sys

USAGE = """human_3d_reconstruction_tpu — TPU-native 3D human mesh recovery

entry points:
  python -m human_3d_reconstruction_tpu.cli.demo          image -> mesh overlay
  python -m human_3d_reconstruction_tpu.cli.video         video -> tracked+smoothed meshes
  python -m human_3d_reconstruction_tpu.cli.train         adversarial training
  python -m human_3d_reconstruction_tpu.cli.eval          MPJPE / PCK protocols
  python -m human_3d_reconstruction_tpu.cli.smpl_forward  theta/beta -> mesh
  python -m human_3d_reconstruction_tpu.cli.convert_annotations
  python -m human_3d_reconstruction_tpu.cli.pack_records
  python -m human_3d_reconstruction_tpu.cli.export        checkpoint -> AOT serving artifact
  python bench.py                                         perf benchmark

presets: smpl_only | single_image | batched_crops | h36m_eval | multi_person
overrides: --section.field=value   (see config.py)
"""


def main() -> None:
    print(USAGE, file=sys.stderr)


if __name__ == "__main__":
    main()
