from .modeling import (
    YOLOWorldConfig,
    YOLOWorldModel,
    YOLOWorldModule,
    simple_nms,
)
