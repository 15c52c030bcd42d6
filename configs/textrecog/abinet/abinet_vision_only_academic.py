# ABINet-Vision (no language model / fuser; reference
# abinet_vision_only_academic.py)
_base_ = ['./abinet_academic.py']
model = dict(iter_size=0, decoder=None, fuser=None)
