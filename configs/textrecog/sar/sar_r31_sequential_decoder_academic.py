# SAR with the step-recurrent decoder (reference
# sar_r31_sequential_decoder_academic.py)
_base_ = ['./sar_r31_parallel_decoder_academic.py']
model = dict(decoder=dict(type='SequentialSARDecoder'))
