"""Regenerate vision4leg_tpu/assets/mount_hf.npz from the reference's
wm_height_out.png (vision4leg/assets/heightmaps/, see
a1_randomizer_ground.py:1011-1024 for the PyBullet load it reproduces).

  python tools/gen_mount_asset.py [path/to/wm_height_out.png]

The committed .npz is what gen_mount actually loads — this tool only
needs to run when the decode convention in envs/terrain.py changes.
"""
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from vision4leg_tpu.envs import terrain


def main():
  png = sys.argv[1] if len(sys.argv) > 1 else terrain._MOUNT_PNG
  grid = terrain.decode_mount_png(png)
  out = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                 "vision4leg_tpu", "assets", "mount_hf.npz")
  origin = 2.0 + (terrain._MOUNT_CROP_I0 - 255.5) * terrain._MOUNT_CELL
  np.savez_compressed(out, height=grid.astype(np.float32),
                      cell=np.float32(terrain._MOUNT_CELL),
                      origin=np.float32(origin))
  print(f"wrote {out}: {grid.shape} z in [{grid.min():.3f}, "
        f"{grid.max():.3f}], origin {origin:.2f}, cell "
        f"{terrain._MOUNT_CELL}")


if __name__ == "__main__":
  main()
