from butterfly_tpu.fac import helm2
