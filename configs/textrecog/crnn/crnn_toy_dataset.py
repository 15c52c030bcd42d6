# CRNN on the toy dataset (reference crnn_toy_dataset.py)
_base_ = ['./crnn_academic_dataset.py',
          '../../_base_/recog_datasets/toy_data.py']
