# BERT-softmax NER (reference configs/ner/bert_softmax/
# bert_softmax_cluener_18e.py)
categories = [
    'address', 'book', 'company', 'game', 'government', 'movie', 'name',
    'organization', 'position', 'scene'
]

test_ann_file = 'data/cluener2020/dev.json'
train_ann_file = 'data/cluener2020/train.json'
vocab_file = 'data/cluener2020/vocab.txt'
max_len = 128

model = dict(
    type='NerClassifier',
    encoder=dict(type='BertEncoder', max_position_embeddings=512,
                 num_hidden_layers=12, hidden_size=768),
    decoder=dict(type='FCDecoder', num_labels=2 * len(categories) + 1),
    loss=dict(type='MaskedCrossEntropyLoss'))

dataset_type = 'NerDataset'
train = dict(
    type=dataset_type,
    ann_file=train_ann_file,
    categories=categories,
    vocab_file=vocab_file,
    max_len=max_len,
    test_mode=False)
test = dict(
    type=dataset_type,
    ann_file=test_ann_file,
    categories=categories,
    vocab_file=vocab_file,
    max_len=max_len,
    test_mode=True)
data = dict(samples_per_gpu=8, workers_per_gpu=2,
            train=train, val=test, test=test)

evaluation = dict(interval=1, metric='f1-score')

optimizer = dict(type='Adam', lr=2e-5)
total_epochs = 18
