from smore_tpu.sampling.alias import AliasTable, build_alias, build_alias_segmented  # noqa: F401
from smore_tpu.sampling.tables import SamplerTables  # noqa: F401
