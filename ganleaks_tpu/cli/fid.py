"""FID CLI (reference entry point: ``z_fid.py:320-334``).

    python -m ganleaks_tpu.cli.fid path1 path2 [--weights converted.npz]
"""

import argparse

from ganleaks_tpu.ops.fid import fid_from_paths, init_inception_params


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", type=str, nargs=2,
                    help="image dirs or .npz statistic files")
    ap.add_argument("--weights", default=None,
                    help="converted InceptionV3 npz "
                         "(tools/convert_inception.py); surrogate otherwise")
    ap.add_argument("--batch_size", type=int, default=50)
    ap.add_argument("--sqrtm", default="newton-schulz",
                    choices=["newton-schulz", "eigh", "scipy"])
    ap.add_argument("--n_chips", type=int, default=1,
                    help=">1 shards the Inception featurize batch-wise "
                         "over a device mesh")
    args = ap.parse_args(argv)

    if args.weights:
        from ganleaks_tpu.utils.checkpoint import load_params_npz
        params = load_params_npz(args.weights)
        if "params" not in params:
            params = {"params": params}
    else:
        print("# using surrogate InceptionV3 weights (relative FID only); "
              "convert torchvision weights for standard numbers")
        params = init_inception_params()

    mesh = None
    if args.n_chips > 1:
        import jax
        import numpy as np
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()[:args.n_chips]), ("data",))
    value = fid_from_paths(params, args.path[0], args.path[1],
                           args.batch_size, args.sqrtm, mesh=mesh)
    print("FID: ", value)


if __name__ == "__main__":
    main()
