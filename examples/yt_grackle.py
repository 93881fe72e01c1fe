"""yt integration example.

Mirror of grackle: src/python/examples/yt_grackle.py -- load an Enzo
dataset with yt, attach grackle_* derived fields, and sample them.
Requires yt and a dataset path in YT_DATASET.
"""

import os
import sys

from grackle_tpu import add_grackle_fields

if __name__ == "__main__":
    try:
        import yt
    except ImportError:
        sys.exit("yt is required for this example")

    ds_path = os.environ.get("YT_DATASET")
    if not ds_path:
        sys.exit("set YT_DATASET to an Enzo dataset path")

    ds = yt.load(ds_path)
    add_grackle_fields(ds)
    sp = ds.sphere(ds.domain_center, (10, "kpc"))
    print("cooling time:", sp["gas", "grackle_cooling_time"])
    print("temperature:", sp["gas", "grackle_temperature"])
