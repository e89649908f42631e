from layoutdm_tpu.relation.guidance import (  # noqa: F401
    RelationData,
    make_relation_guidance,
)
