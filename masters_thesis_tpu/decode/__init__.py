from masters_thesis_tpu.decode.greedy import (
    make_greedy_decoder,
    make_scanned_greedy_decoder,
)
from masters_thesis_tpu.decode.sampling import make_sampling_decoder
from masters_thesis_tpu.decode.beam import (
    make_beam_decoder,
    make_scanned_beam_decoder,
)

__all__ = ["make_greedy_decoder", "make_scanned_greedy_decoder",
           "make_sampling_decoder", "make_beam_decoder",
           "make_scanned_beam_decoder"]
