from butterfly_tpu.models import retrieval
