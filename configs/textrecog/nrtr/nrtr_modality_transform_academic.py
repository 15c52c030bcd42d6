# NRTR + modality-transform stem (reference
# nrtr_modality_transform_academic.py + _base_/recog_models/
# nrtr_modality_transform.py)
_base_ = [
    '../../_base_/default_runtime.py',
    '../../_base_/schedules/schedule_adam_step_6e.py',
    '../../_base_/recog_models/nrtr_modality_transform.py',
    '../../_base_/recog_pipelines/nrtr_pipeline.py',
    '../../_base_/recog_datasets/academic_test_high.py',
]
test_pipeline = '{{_base_.test_pipeline}}'
evaluation = dict(interval=1, metric='acc')
