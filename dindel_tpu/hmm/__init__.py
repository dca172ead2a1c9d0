from .reference import pair_hmm_single  # noqa: F401
