# BERT-softmax NER (reference configs/ner/bert_softmax/...)
model = dict(
    type='NerClassifier',
    encoder=dict(type='BertEncoder', max_position_embeddings=512,
                 num_hidden_layers=12, hidden_size=768),
    decoder=dict(type='FCDecoder', num_labels=34),
    loss=dict(type='MaskedCrossEntropyLoss'))
optimizer = dict(type='Adam', lr=2e-5)
total_epochs = 18
