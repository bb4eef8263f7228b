from gan_tpu.objectives.presets import Objective, get_objective, OBJECTIVES  # noqa: F401
