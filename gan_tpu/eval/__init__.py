from gan_tpu.eval.fid import compute_fid, frechet_distance, RandomConvFeatures  # noqa: F401
