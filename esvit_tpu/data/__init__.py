from esvit_tpu.data.loader import build_train_iterator, synthetic_batches
