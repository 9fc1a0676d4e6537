from butterfly_tpu.fac import helm2
from butterfly_tpu.fac.uniformize import (
    choose_block_align,
    fac_block_stats,
    uniformize,
)
