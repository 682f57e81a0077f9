"""openai-whisper stub: asr_integration.py:12 imports it at module scope;
load_model is reached only on the (non-default) openai backend path
(asr_integration.py:78-82), unreachable in zero-egress runs."""


def load_model(name, *a, **kw):
    raise RuntimeError("whisper shim: no pretrained weights reachable "
                       "(zero-egress environment)")
