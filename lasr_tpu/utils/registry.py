"""Config + registry core.

Provides the exact YAML-config contract of the reference
(``lasr/utils/generater.py:5-109``, ``lasr/utils/register.py:1-42``): every
model / optimizer / criterion / tokenizer / dataset in a ``config.yaml`` is a
``{name: 'module.path:ClassName', kwargs: {...}}`` block that is dynamically
imported and signature-validated before instantiation, so any Python API can
be wired in from YAML.  Pure host-side Python — nothing here touches JAX.
"""

from __future__ import annotations

import importlib
import inspect
import warnings
from typing import Any, Callable, Dict, Iterable, Optional


# Drop-in migration for existing reference YAMLs: a config.yaml /
# hparams.yaml / decode.yaml written for the reference names its classes by
# reference module path ('lasr.…', 'torch.optim:Adam').  Those name strings
# translate transparently onto the lasr_tpu implementations, whose
# constructors accept the same kwargs (the YAML contract), so the file runs
# unmodified through bin/train.py / bin/decode.py.  The table covers every
# reference class that is meaningful inside a config block (models
# e2e_{transformer,conformer,…}.py, losses e2e_loss*.py, optimizer/scheduler
# optimizer.py:22/scheduler.py:3, tokenizers tokenizer.py:70-222, datasets
# dataset.py:25/234, RNNLM rnn/lstm.py:33-138).  See docs/MIGRATION.md.
REFERENCE_NAME_ALIASES: Dict[str, str] = {
    "lasr.model.e2e_ctc_att.e2e_transformer:E2E_Transformer_CTC":
        "lasr_tpu.models.e2e_ctc_att:E2E_Transformer_CTC",
    "lasr.model.e2e_ctc_att.e2e_conformer:E2E_Conformer_CTC":
        "lasr_tpu.models.e2e_ctc_att:E2E_Conformer_CTC",
    "lasr.model.e2e_ctc_att.e2e_transformer_online:E2E_Transformer_CTC_Online":
        "lasr_tpu.models.e2e_online:E2E_Transformer_CTC_Online",
    "lasr.model.e2e_ctc_att.e2e_transformer_online_offline:"
    "E2E_Transformer_CTC_Univ_Dynamic":
        "lasr_tpu.models.e2e_online:E2E_Transformer_CTC_Univ_Dynamic",
    "lasr.model.e2e_ctc_att.e2e_loss:E2E_Loss":
        "lasr_tpu.models.losses:E2E_Loss",
    "lasr.model.e2e_ctc_att.e2e_loss_univ:CTC_CE_Univ_Loss":
        "lasr_tpu.models.losses_univ:CTC_CE_Univ_Loss",
    "torch.optim:Adam": "lasr_tpu.train.optimizer:Adam",
    "lasr.modules.optimizer.optimizer:Noam": "lasr_tpu.train.optimizer:Noam",
    "lasr.modules.optimizer.scheduler:WarmupScheduler":
        "lasr_tpu.train.optimizer:WarmupScheduler",
    "lasr.data.tokenizer:CharTokenizer":
        "lasr_tpu.data.tokenizer:CharTokenizer",
    "lasr.data.tokenizer:HuggingTokenizer":
        "lasr_tpu.data.tokenizer:HuggingTokenizer",
    "lasr.data.tokenizer:SPMTokenizer":
        "lasr_tpu.data.tokenizer:SPMTokenizer",
    "lasr.data.dataset:AudioDataSet": "lasr_tpu.data.dataset:AudioDataSet",
    "lasr.data.dataset:BatchAudioDataSet":
        "lasr_tpu.data.dataset:BatchAudioDataSet",
    "lasr.modules.net.rnn.lstm:LSTMStack": "lasr_tpu.modules.rnn:LSTMStack",
    "lasr.modules.net.rnn.lstm:RNNCellStack":
        "lasr_tpu.modules.rnn:RNNCellStack",
}


def dynamic_import(import_path: str, alias: Optional[Dict[str, str]] = None):
    """Resolve ``'pkg.module:ClassName'`` to the class/function object.

    ``alias`` optionally maps shorthand names to full import paths (same
    contract as reference generater.py:5-23).  Reference-framework paths
    (``REFERENCE_NAME_ALIASES``) translate onto lasr_tpu classes so existing
    reference YAMLs run unmodified; an explicit ``alias`` entry wins.
    """
    alias = alias or {}
    if ":" not in import_path:
        if import_path not in alias:
            raise ValueError(
                f"import path {import_path!r} must contain ':' "
                f"(e.g. 'lasr_tpu.models.e2e_ctc_att:E2E_Conformer_CTC') "
                f"or be one of the aliases {sorted(alias)}"
            )
        import_path = alias[import_path]
    elif import_path in alias:
        # a full-path alias entry overrides, including the reference table
        import_path = alias[import_path]
    if import_path in REFERENCE_NAME_ALIASES:
        translated = REFERENCE_NAME_ALIASES[import_path]
        warnings.warn(
            f"config names the reference class {import_path!r}; using the "
            f"lasr_tpu implementation {translated!r} (docs/MIGRATION.md)",
            stacklevel=2)
        import_path = translated
    module_name, _, obj_name = import_path.partition(":")
    try:
        module = importlib.import_module(module_name)
    except ImportError:
        if module_name.split(".")[0] == "lasr":
            raise ImportError(
                f"config names the reference module {module_name!r}, which "
                f"is not installed and has no entry in "
                f"REFERENCE_NAME_ALIASES — see docs/MIGRATION.md for the "
                f"reference→lasr_tpu class map") from None
        raise
    try:
        return getattr(module, obj_name)
    except AttributeError as e:
        raise ImportError(f"module {module_name!r} has no attribute {obj_name!r}") from e


def check_kwargs(cls, kwargs: Dict[str, Any], name: Optional[str] = None) -> None:
    """Validate ``kwargs`` against ``cls.__init__``'s signature.

    Raises ``ValueError`` on any key the constructor does not accept (unless
    it takes ``**kwargs``).  This is the whole config "schema" — same policy
    as reference generater.py:65-99.
    """
    try:
        params = inspect.signature(cls.__init__).parameters
    except (ValueError, TypeError):
        return  # builtins without introspectable signatures: accept anything
    if any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()):
        return
    name = name or getattr(cls, "__name__", str(cls))
    for key in kwargs:
        if key not in params:
            raise ValueError(
                f"initialization of class {name!r} got an unexpected keyword "
                f"argument {key!r}; accepted parameters are {list(params)}"
            )


class BaseConfig:
    """One ``{name, kwargs}`` YAML block, instantiable on demand.

    ``generateExample(*args, **overrides)`` builds the target object; call-site
    keyword arguments override the YAML ones (this is how the driver injects
    ``tokenizer=`` into datasets and ``odim`` into models — reference
    bin/train_lighting.py:158-177).  ``name`` of ``None``/"None" produces a
    config whose ``generateExample`` returns ``None``.
    """

    def __init__(self, name: Optional[str], kwargs: Optional[Dict[str, Any]] = None,
                 **extra: Any):
        # Extra keys (e.g. a nested 'scheduler' block inside opti_config) are
        # kept but ignored, matching the reference's YAML layout.
        self.conf_dict: Dict[str, Any] = dict(kwargs or {})
        self.extra = extra
        if name is None or name == "None":
            self.name = None
            self.conf_class = None
            return
        self.name = name
        self.conf_class = dynamic_import(name)
        check_kwargs(self.conf_class, self.conf_dict)

    def generateExample(self, *args: Any, **kwargs: Any):
        if self.name is None:
            return None
        merged = dict(self.conf_dict)
        merged.update(kwargs)
        return self.conf_class(*args, **merged)

    # dict-style access to the kwargs block (reference generater.py:52-63)
    def __getitem__(self, key: str) -> Any:
        return self.conf_dict[key]

    def __setitem__(self, key: str, value: Any) -> None:
        if key not in self.conf_dict:
            warnings.warn(f"{key!r} is not in this config", RuntimeWarning)
        self.conf_dict[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self.conf_dict

    def get_conf_dict(self) -> Dict[str, Any]:
        return self.conf_dict


class Register:
    """String-keyed decorator registry (reference register.py:1-42).

    Usage::

        register_trans = Register()

        @register_trans.register("fbank:80")
        def fbank80(...): ...

        @register_trans.register          # registers under function __name__
        def norm(...): ...
    """

    def __init__(self) -> None:
        self._dict: Dict[str, Callable] = {}

    def register(self, target):
        def _add(key: str, value: Callable) -> Callable:
            if not callable(value):
                raise TypeError(f"register object must be callable, got {value!r}")
            if key in self._dict:
                warnings.warn(f"{key!r} was already registered; overriding")
            self._dict[key] = value
            return value

        if callable(target):
            return _add(target.__name__, target)
        return lambda fn: _add(target, fn)

    __call__ = register

    def __getitem__(self, key: str) -> Callable:
        return self._dict[key]

    def __setitem__(self, key: str, value: Callable) -> None:
        self._dict[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self._dict

    def keys(self) -> Iterable[str]:
        return self._dict.keys()

    def values(self):
        return self._dict.values()

    def items(self):
        return self._dict.items()

    def __str__(self) -> str:
        return str(self._dict)
