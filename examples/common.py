"""Shared example helpers: locate (or synthesize) a grackle data file."""

import os
import sys

# make the repo importable when examples run from this directory
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)


def get_data_file():
    """Use GRACKLE_DATA_FILE if set (e.g. a real CloudyData_UVB=HM2012.h5),
    otherwise generate a synthetic file with the same schema."""
    path = os.environ.get("GRACKLE_DATA_FILE")
    if path and os.path.exists(path):
        return path
    my_dir = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(my_dir, ".synthetic_cloudy.h5")
    if not os.path.exists(path):
        from grackle_tpu.data.synthetic import make_synthetic_data_file
        make_synthetic_data_file(path)
    return path
