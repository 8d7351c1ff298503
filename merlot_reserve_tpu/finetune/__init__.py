from merlot_reserve_tpu.finetune.models import (  # noqa: F401
    MerlotReserveTVQA,
    MerlotReserveTVQAZeroShot,
    MerlotReserveVCR,
    MerlotReserveVCRZeroShot,
)
