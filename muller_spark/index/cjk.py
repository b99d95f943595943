"""Pure-Python CJK word segmentation: forward maximum matching (FMM).

The reference tokenizes Chinese text with jieba
(``muller/core/query/inverted_index_vectorized.py:122-158``, optional
user dict via ``load_userdict``).  jieba is not installed in this
environment, so this module vendors the classic dictionary-based
forward-maximum-match algorithm — at each position, take the longest
dictionary word starting there, else emit the single character — with a
compact built-in lexicon of frequent Mandarin words.  FMM is the
textbook baseline jieba itself falls back toward (its DAG + max-prob
route degenerates to greedy longest-match for words the HMM can't
split), and crucially it is *deterministic and identical* on the build
side and the query side, which is what index/query token parity needs.

The built-in lexicon is intentionally small (common 2-4 character words
of everyday Mandarin).  Like jieba's ``load_userdict``, callers extend
it per-corpus via :meth:`FMMSegmenter.add_words` — the reference's
"compulsory words" hook (``test_inverted_index_local.py`` wires
``compulsory_words.txt`` the same way).

No code or data is copied from jieba; the word list below is ordinary
public vocabulary.
"""

from __future__ import annotations

import re

CJK_RUN_REGEX = r"[一-鿿㐀-䶿]+"
_CJK_RE = re.compile(CJK_RUN_REGEX)

# Frequent Mandarin multi-character words (everyday vocabulary, numbers,
# time words, plus classical-poetry staples so verse corpora segment
# into meaningful units rather than single characters).
_DEFAULT_WORDS = """
我们 你们 他们 她们 它们 自己 大家 别人 一个 一些 这个 那个 这些 那些
什么 怎么 为什么 怎么样 因为 所以 但是 可是 如果 虽然 然后 现在 已经
正在 马上 刚才 今天 明天 昨天 今年 明年 去年 时候 时间 小时 分钟 星期
上午 下午 晚上 早上 中午 夜里 世界 中国 美国 国家 城市 农村 地方 东西
事情 工作 学习 生活 问题 办法 方法 意思 名字 先生 女士 同学 老师 学生
朋友 孩子 父母 爸爸 妈妈 哥哥 姐姐 弟弟 妹妹 家人 人们 喜欢 认识 知道
觉得 认为 希望 需要 应该 可以 可能 能够 愿意 开始 结束 继续 停止 进行
发现 发生 出现 成为 变成 得到 失去 带来 拿来 回来 出去 进来 起来 下去
上来 过来 过去 以前 以后 之前 之后 左右 中间 旁边 前面 后面 上面 下面
里面 外面 东边 西边 南边 北边 附近 周围 地上 天上 山上 水里 海里 河里
高兴 快乐 幸福 难过 伤心 生气 着急 害怕 担心 放心 小心 注意 认真 努力
简单 容易 困难 复杂 重要 主要 特别 一般 普通 正常 奇怪 有趣 没有 有些
许多 很多 非常 十分 特点 样子 颜色 声音 音乐 电影 电视 电话 手机 电脑
网络 数据 信息 消息 新闻 报纸 书本 文章 故事 历史 文化 科学 技术 艺术
经济 社会 政府 公司 学校 医院 商店 饭店 宾馆 车站 机场 火车 汽车 飞机
自行车 地铁 公共 汽车站 道路 马路 街道 公园 广场 花园 房子 房间 厨房
教室 办公室 图书馆 操场 体育 运动 足球 篮球 乒乓球 游泳 跑步 散步 旅游
旅行 参观 访问 见面 开会 上班 下班 上课 下课 放假 休息 睡觉 起床 吃饭
早饭 午饭 晚饭 米饭 面条 饺子 包子 鸡蛋 牛奶 面包 水果 苹果 香蕉 西瓜
蔬菜 白菜 土豆 西红柿 猪肉 牛肉 羊肉 鱼肉 喝水 茶叶 咖啡 啤酒 衣服 裤子
鞋子 帽子 眼镜 手表 钱包 东南 西北 春天 夏天 秋天 冬天 天气 下雨 下雪
刮风 太阳 月亮 星星 明月 春风 秋风 江南 千里 万里 白日 黄河 长江 大海
入海 高山 青山 钟山 流水 山水 风景 故乡 家乡 思乡 低头 举头 抬头 回头
充满 不让 迅雷 掩耳 盗铃 叮当 京口 瓜洲 层楼 上楼 下楼 明亮 光明 月光
灯光 阳光 希望工程 一水 数重 何时 照我 还乡 春眠 处处 闻啼 夜来 风雨
花落 知多少 静夜 思念 疑是 地上霜 望月 山尽 海流 欲穷 千里目 更上
一层楼 床前 申请 处理 分析 搜索 查询 索引 向量 文本 图片 图像 音频
视频 文件 系统 版本 分支 合并 提交 数据集 数据库 模型 训练 测试 样本
特征 标签 分类 聚类 相似 匹配 过滤 排序 分组 聚合 统计 平均 最大 最小
总和 数量 质量 速度 性能 内存 磁盘 计算 存储 读取 写入 删除 更新 插入
""".split()


class FMMSegmenter:
    """Greedy longest-match segmenter over a word set.

    >>> FMMSegmenter().cut("床前明月光")
    ['床前', '明月', '光']
    """

    def __init__(self, words: "list[str] | None" = None) -> None:
        self._words = set(_DEFAULT_WORDS if words is None else words)
        self._max_len = max((len(w) for w in self._words), default=1)

    def add_words(self, words: "list[str]") -> None:
        """Extend the lexicon (jieba ``load_userdict`` analogue)."""
        self._words.update(words)
        self._max_len = max(self._max_len, max((len(w) for w in words), default=1))

    def cut(self, text: str) -> list[str]:
        out: list[str] = []
        i, n = 0, len(text)
        while i < n:
            match = None
            for width in range(min(self._max_len, n - i), 1, -1):
                cand = text[i : i + width]
                if cand in self._words:
                    match = cand
                    break
            if match is None:
                match = text[i]  # single character fallback
            out.append(match)
            i += len(match)
        return out


_DEFAULT_SEGMENTER: FMMSegmenter | None = None


def default_segmenter() -> FMMSegmenter:
    global _DEFAULT_SEGMENTER
    if _DEFAULT_SEGMENTER is None:
        _DEFAULT_SEGMENTER = FMMSegmenter()
    return _DEFAULT_SEGMENTER


def cut_mixed(text: str, word_split_regex: str) -> list[str]:
    """Tokenize mixed CJK/non-CJK text: CJK runs go through FMM, the
    rest through the same word-split regex as pure-ASCII text, with
    original ordering preserved."""
    seg = default_segmenter()
    out: list[str] = []
    pos = 0
    for m in _CJK_RE.finditer(text):
        if m.start() > pos:
            out.extend(t for t in re.split(word_split_regex, text[pos : m.start()]) if t)
        out.extend(seg.cut(m.group()))
        pos = m.end()
    if pos < len(text):
        out.extend(t for t in re.split(word_split_regex, text[pos:]) if t)
    return out
