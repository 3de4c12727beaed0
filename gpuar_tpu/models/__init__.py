from gpuar_tpu.models.adaptive import (  # noqa: F401
    AdaptiveModel,
    initial_cumfreq,
    initial_cumprob,
)
