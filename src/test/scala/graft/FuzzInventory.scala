package graft
import graft.ops.Fuzz
import graft.ops.Fuzz._
object FuzzInventory {
  def prOps(p: Pr): Set[String] = p match {
    case _: Cmp => Set("cmp")
    case _: IsNull => Set("isnull")
    case AndP(a,b) => prOps(a)++prOps(b)+"and"
    case OrP(a,b) => prOps(a)++prOps(b)+"or"
    case NotP(a) => prOps(a)+"not"
    case _: NsEq => Set("nseq")
    case _: InP => Set("in")
    case _: LikeP => Set("like")
  }
  private def agName(a: Ag): String = a match {
    case _: AvgL => "avg"; case _: SumL => "sum"
    case _: CntD => "cntd"; case _: SumCase => "sumcase"
    case _ => "aggf"
  }
  def ops(p: Pl): Set[String] = p match {
    case _: Scan => Set("scan")
    case Proj(in,_) => ops(in)+"proj"
    case Filt(in,pr) => ops(in)+"filt"++prOps(pr)
    case FiltSub(in,_,_,sub) => ops(in)++ops(sub)+"filtsub"
    case Agg(in,_,aggs) => ops(in)+"agg"++aggs.map(x=>agName(x._2)).toSet
    case Roll(in,_,aggs,cube,gid) =>
      ops(in)+(if (cube) "cube" else "rollup")++
        (if (gid.isDefined) Set("gid") else Set.empty[String])++
        aggs.map(x=>agName(x._2)).toSet
    case Jn(l,r,_,_,jt) => ops(l)++ops(r)+("join_"+jt)
    case Dist(in) => ops(in)+"distinct"
    case Wnd(in,_,f,_,_,_,_) => ops(in)+("wnd_"+f)
    case Expl(in,_,_,_) => ops(in)+"explode"
    case Lim(in,_) => ops(in)+"limit"
    case UnionA(l,r) => ops(l)++ops(r)+"union"
    case SetOp(l,r,o) => ops(l)++ops(r)+("set_"+o)
  }
  def main(args: Array[String]): Unit =
    (args(0).toInt to args(1).toInt).foreach { s =>
      println(f"[inv] $s%03d ${ops(Fuzz.gen(s.toLong)).toSeq.sorted.mkString(",")}")
    }
}
