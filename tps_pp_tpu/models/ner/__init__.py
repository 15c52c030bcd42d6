from .bert import (BertEncoder, FCDecoder, NerClassifierModule,
                   MaskedCrossEntropyLoss)
