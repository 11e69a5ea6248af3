from slamem_tpu.oracle.naive import (  # noqa: F401
    find_mems_codes,
    count_occurrences,
    filter_mode,
    oracle_matches,
)
