"""Transcript table source.

Schema (BASELINE.json input_hint):
    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp[us]

Three entry points:

- ``synthesize_transcripts(n, seed, skew)`` — deterministic in-memory table
  with the FIXTURES.md §2 content mix (the correctness/bench corpus; the
  reference consumes directories of .txt files — ref:main.py:268 — which have
  no schema; this is the transcript-shaped equivalent).
- ``write_transcripts(dir, n, ...)`` — shard the synthetic table to Parquet
  (multiple files so Ray parallelizes the read).
- ``read_transcripts(path)`` — ray.data.read_parquet with column pruning.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

_EPOCH_US = 1_700_000_000_000_000  # fixed base, 2023-11-14T22:13:20Z

# ---------------------------------------------------------------------------
# Content pools (authored; exercise the operators per FIXTURES.md §2)
# ---------------------------------------------------------------------------

CLEAN_SENTENCES = [
    "今天的讨论主要围绕数据处理流程的设计展开大家提出了许多建设性的意见",
    "我们在会议上回顾了上个季度的工作进展并且对下一阶段的目标进行了详细的规划",
    "这本书讲述了一位青年科学家在偏远山区进行地质考察的经历文字朴实而感人",
    "清晨的阳光洒在湖面上微风吹过泛起层层涟漪远处的山峦在薄雾中若隐若现",
    "学习一门新的编程语言需要耐心和持续的练习理解其设计哲学比记住语法更重要",
    "城市的公共交通系统近年来有了明显的改善地铁线路覆盖了大部分居民区",
    "研究人员通过长期观测发现候鸟的迁徙路线与气候变化之间存在密切的关联",
    "传统手工艺的传承面临许多挑战年轻一代的参与对其延续具有重要的意义",
    "合理的作息时间和均衡的饮食习惯对保持身体健康起着至关重要的作用",
    "图书馆新增了一批科技类藏书涵盖了人工智能材料科学和生物工程等领域",
    "志愿者们利用周末时间清理了河岸的垃圾并向居民宣传环境保护的知识",
    "这部纪录片记录了大熊猫在自然保护区的日常生活画面温馨而充满趣味",
    "工程师们经过反复试验终于解决了桥梁结构中的共振问题确保了行车安全",
    "农业专家深入田间地头指导农户科学种植水稻今年的收成比去年有所提高",
    "博物馆的新展览以丝绸之路为主题展出了大量珍贵的文物和历史资料",
    "气象部门发布了下周的天气预报提醒市民注意防范强对流天气带来的影响",
    "社区组织了一场别开生面的读书分享会居民们踊跃发言交流阅读心得",
    "科研团队在深海探测任务中采集到了新的样本为海洋生物研究提供了依据",
]

SEO_KEYWORDS = [
    "在线播放", "高清资源", "免费观看", "最新大片", "热门影视", "久久精品",
    "一区二区", "不卡顿", "极速下载", "海量片库", "成人视频", "激情视频",
    "日韩专区", "欧美大片", "午夜剧场", "vip通道",
]

SHORT_TEXTS = [
    "好的。", "收到", "明白了", "下次再聊", "没问题", "谢谢你的帮助",
    "这个方案可以", "周五之前完成", "我再确认一下", "记得带文件",
    "好的明天见面再说", "请稍等片刻马上回来",
]

ENGLISH_SENTENCES = [
    "The quarterly report shows steady growth across all regions.",
    "Please review the attached document before tomorrow's meeting.",
    "Our team completed the migration ahead of schedule.",
    "The new framework simplifies deployment and monitoring.",
    "Customer feedback has been overwhelmingly positive this month.",
]

AD_SNIPPETS = [
    "年底特价大促销全场优惠不容错过",
    "限时抢购免费领取精美礼品",
    "低价包邮正品保证赶快下单",
    "加微信领取内部优惠券",
    "点击链接立即抢购特价商品",
    "联系电话一三九零零零零八八八八诚信经营",
    "兼职刷单日赚千元名额有限",
    "发票代开手续齐全价格从优",
]

SENSITIVE_SNIPPETS = [
    "据调查该团伙长期从事赌博活动",
    "警方查获了一批涉及色情的出版物",
    "此类海洛因交易将被严厉打击",
    "有人在网上兜售假证被依法处理",
    "该网站因传播六合彩信息被关停",
    "办证刻章的小广告贴满了街头",
]

NEGATIVE_SNIPPETS = [
    "本平台严格审核所有内容不包含任何色情与赌博信息",
    "社区规范明确禁止发布色情内容违者将被永久封禁",
    "我们坚决反对赌博行为并配合有关部门进行治理",
    "审核团队拒绝一切色情与广告信息的传播",
]

REPEAT_PHRASES = [
    "重要的事情说三遍请大家务必准时参加本周的例会不要迟到",
    "点击就送豪华大礼包心动不如行动快来参与活动吧",
    "本店商品一律正品保证假一赔十欢迎新老顾客选购",
]

COMMA_WORDS = ["手机", "电脑", "相机", "耳机", "键盘", "鼠标", "显示器", "音箱", "路由器", "硬盘", "内存", "主板"]

URLS = [
    "https://example.com/page1", "http://news.example.org/article/2024",
    "www.shop-example.net/item/88", "https://blog.example.cn/post/42",
    "www.video-example.tv/watch/7", "http://forum.example.io/thread/9",
]

EMOJIS = ["😀", "🎉", "🔥", "😂", "👍", "💰", "🚀", "🌟"]

TOOL_NAMES = ["search", "calculator", "db_query", "code_exec", "web_fetch"]

EXACT_DUP_TEXTS = [
    "这是一段会在语料中反复出现的公告内容请各位用户知晓平台将于本周末进行系统维护届时服务会短暂中断感谢大家的理解与支持",
    "欢迎加入我们的讨论组本组主要交流数据处理与机器学习相关话题请大家遵守讨论规范共同维护良好的交流氛围",
]

NEAR_DUP_BASES = [
    "机器学习模型的训练过程需要大量高质量的数据支持数据清洗与预处理环节直接影响最终模型的效果因此建立完善的数据质量评估体系十分必要",
    "分布式计算框架通过将任务拆分到多个节点并行执行大幅提升了海量数据的处理效率容错机制则保证了长时间运行任务的稳定性",
    "自然语言处理技术在近年来取得了长足的进步预训练语言模型在多项任务上超越了传统方法成为该领域的主流范式",
]

EDGE_TEXTS = [
    "",                          # empty → reference rule-score error path
    "   \n  \t ",                # whitespace-only
    "这是一段十三个字的测试文本啊",  # exactly 13 chars
    "1989",                      # prefix of the wordlist entry 1989年 — must NOT scrub
    "那一年是1989年发生了许多事情",  # contains the entry → scrub stars it
    "SpamWord MIXED case TEST around 特价 word",  # lowercasing semantics
]

CLASS_WEIGHTS = [
    ("clean", 0.55), ("too_short", 0.06), ("seo_vbar", 0.04), ("low_zh", 0.05),
    ("ad_words", 0.06), ("sensitive", 0.06), ("negative", 0.02), ("repetitive", 0.04),
    ("comma_heavy", 0.02), ("url_heavy", 0.02), ("emoji_heavy", 0.02),
    ("tool_json", 0.03), ("near_dup", 0.015), ("exact_dup", 0.01), ("edge", 0.005),
]


def _gen_text(cls: str, rng: random.Random, i: int) -> str:
    if cls == "clean":
        k = rng.randint(2, 4)
        sents = rng.sample(CLEAN_SENTENCES, k)
        sep = rng.choice(["。\n", "。"])
        return sep.join(sents) + f"。（记录{i % 1000}）"
    if cls == "too_short":
        return rng.choice(SHORT_TEXTS)
    if cls == "seo_vbar":
        k = rng.randint(8, 14)
        return "|".join(rng.choice(SEO_KEYWORDS) for _ in range(k))
    if cls == "low_zh":
        k = rng.randint(2, 4)
        base = " ".join(rng.sample(ENGLISH_SENTENCES, min(k, len(ENGLISH_SENTENCES))))
        return base + rng.choice(["", " 附注如上。"])
    if cls == "ad_words":
        sents = rng.sample(CLEAN_SENTENCES, 2)
        ads = rng.sample(AD_SNIPPETS, rng.randint(2, 4))
        parts = sents[:1] + ads + sents[1:]
        rng.shuffle(parts)
        return "。".join(parts) + "。"
    if cls == "sensitive":
        sents = rng.sample(CLEAN_SENTENCES, 2)
        sens = rng.sample(SENSITIVE_SNIPPETS, rng.randint(1, 2))
        return "。".join([sents[0]] + sens + [sents[1]]) + "。"
    if cls == "negative":
        sents = rng.sample(CLEAN_SENTENCES, 4)
        neg = rng.choice(NEGATIVE_SNIPPETS)
        return "。".join(sents[:2] + [neg] + sents[2:]) + "。"
    if cls == "repetitive":
        phrase = rng.choice(REPEAT_PHRASES)
        return phrase * rng.randint(6, 10)
    if cls == "comma_heavy":
        k = rng.randint(30, 50)
        return ",".join(rng.choice(COMMA_WORDS) for _ in range(k))
    if cls == "url_heavy":
        sents = rng.sample(CLEAN_SENTENCES, 2)
        urls = [rng.choice(URLS) for _ in range(rng.randint(6, 10))]
        return sents[0] + " " + " ".join(urls) + " " + sents[1]
    if cls == "emoji_heavy":
        sent = rng.choice(CLEAN_SENTENCES)
        out = []
        for j, ch in enumerate(sent):
            out.append(ch)
            if j % 3 == 0:
                out.append(rng.choice(EMOJIS))
        return "".join(out)
    if cls == "tool_json":
        items = ", ".join(str(rng.randint(0, 999)) for _ in range(rng.randint(3, 8)))
        return f'{{"status": "ok", "code": {rng.randint(200, 599)}, "items": [{items}], "elapsed_ms": {rng.randint(1, 5000)}}}'
    if cls == "exact_dup":
        return rng.choice(EXACT_DUP_TEXTS)
    if cls == "near_dup":
        base = rng.choice(NEAR_DUP_BASES)
        edit = rng.randint(0, 3)
        if edit == 0:
            return base
        if edit == 1:
            return base + f"补充{rng.randint(0, 9)}"
        if edit == 2:
            return "按语" + base
        return base.replace("数据", "資料", 1)
    if cls == "edge":
        return rng.choice(EDGE_TEXTS)
    raise ValueError(cls)


def synthesize_transcripts(n: int, seed: int = 42, skew: bool = False) -> pa.Table:
    """Deterministic synthetic transcript table of ``n`` turns.

    ``skew=True`` assigns ~50% of rows to a single hot conversation
    ``conv-hot`` (the conv_id-skew fixture of SURVEY §4 / FIXTURES §1)."""
    rng = random.Random(seed)
    classes = [c for c, _ in CLASS_WEIGHTS]
    weights = [w for _, w in CLASS_WEIGHTS]
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []
    i = 0
    conv_no = 0
    while i < n:
        if skew and rng.random() < 0.5:
            conv, length = "conv-hot", min(rng.randint(16, 64), n - i)
            start_idx = len([1 for c in conv_ids[-200:] if c == "conv-hot"])  # approximate; fixed below
        else:
            conv, length = f"conv-{conv_no:08d}", min(rng.randint(1, 16), n - i)
            conv_no += 1
            start_idx = 0
        for t in range(length):
            cls = rng.choices(classes, weights)[0]
            text = _gen_text(cls, rng, i)
            if cls == "tool_json":
                role, tool = "tool", rng.choice(TOOL_NAMES)
            else:
                role, tool = ("user", "") if (t % 2 == 0) else ("assistant", "")
            conv_ids.append(conv)
            turn_idxs.append(start_idx + t)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(_EPOCH_US + i * 1_000_000)
            i += 1
    # make (conv_id, turn_idx) unique for the hot conversation: renumber per conv
    if skew:
        seen: dict[str, int] = {}
        for j, c in enumerate(conv_ids):
            k = seen.get(c, 0)
            turn_idxs[j] = k
            seen[c] = k + 1
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def write_transcripts(
    out_dir: str, n: int, seed: int = 42, skew: bool = False, rows_per_file: int = 100_000
) -> str:
    """Shard the synthetic table into ``out_dir`` (idempotent: skipped when the
    directory already holds the matching _meta marker)."""
    meta_path = os.path.join(out_dir, "_meta.txt")
    marker = f"n={n} seed={seed} skew={int(skew)} rpf={rows_per_file} v=3"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if f.read().strip() == marker:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    # marker mismatch (or missing): drop every existing shard BEFORE writing,
    # so regenerating with a smaller n can't leave stale shards that
    # read_transcripts would glob into the corpus
    if os.path.exists(meta_path):
        os.remove(meta_path)
    for f in os.listdir(out_dir):
        if f.startswith("transcripts-") and f.endswith(".parquet"):
            os.remove(os.path.join(out_dir, f))
    table = synthesize_transcripts(n, seed=seed, skew=skew)
    for fi, off in enumerate(range(0, table.num_rows, rows_per_file)):
        chunk = table.slice(off, rows_per_file)
        # small row groups let Ray split a file into multiple read blocks
        pq.write_table(chunk, os.path.join(out_dir, f"transcripts-{fi:05d}.parquet"),
                       row_group_size=5_000)
    with open(meta_path, "w") as f:
        f.write(marker + "\n")
    return out_dir


def read_transcripts(path: str, columns: list[str] | None = None):
    """ray.data.read_parquet over a transcript dir/file with column pruning."""
    import ray.data as rd

    paths = path
    if os.path.isdir(path):
        paths = [
            os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")
        ]
    return rd.read_parquet(paths, columns=columns)
